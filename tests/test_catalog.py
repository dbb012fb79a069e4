"""Table-IO abstraction: identifier detection and parquet fallback."""

from pdf_ocr_spark.catalog import (
    append, is_table_identifier, load_table, overwrite_partitions,
)


def test_identifier_detection():
    assert is_table_identifier("lake.transcripts_out")
    assert is_table_identifier("transcripts")
    assert not is_table_identifier("/data/out")
    assert not is_table_identifier("s3a://bucket/path")
    assert not is_table_identifier("file:///tmp/x")


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1, 0), ("b", 2, 1)], "k string, v int, bucket int")
    path = str(tmp_path / "t")
    overwrite_partitions(df, path, "bucket")
    assert load_table(spark, path).count() == 2
    # dynamic overwrite: rewriting bucket 0 leaves bucket 1 intact
    overwrite_partitions(df.filter("bucket = 0"), path, "bucket")
    out = load_table(spark, path)
    assert out.filter("bucket = 1").count() == 1
    assert out.filter("bucket = 0").count() == 1
    # append targets are unpartitioned (lineage-table shape)
    lin = str(tmp_path / "lin")
    append(df.drop("bucket"), lin)
    append(df.drop("bucket"), lin)
    assert load_table(spark, lin).count() == 4


def test_overwrite_is_dynamic_even_with_static_session_conf(spark, tmp_path):
    """ADVICE r1: run_extraction accepts ANY user session. With the Spark
    default partitionOverwriteMode=static, a partitioned overwrite would
    truncate the whole table — deleting completed buckets that lineage
    still marks done. The per-write option must win over session conf."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "static")
    try:
        df = spark.createDataFrame(
            [("a", 1, 0), ("b", 2, 1)], "k string, v int, bucket int")
        path = str(tmp_path / "t")
        overwrite_partitions(df, path, "bucket")
        overwrite_partitions(df.filter("bucket = 0"), path, "bucket")
        out = load_table(spark, path)
        assert out.filter("bucket = 1").count() == 1, \
            "static overwrite truncated a completed bucket"
        assert out.filter("bucket = 0").count() == 1
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)
