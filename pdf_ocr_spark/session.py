"""SparkSession construction with the engine's physical defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DEFAULT


def build_session(app_name: str = "pdf-ocr-spark", cores: int | None = None,
                  shuffle_partitions: int | None = None,
                  extra_conf: dict | None = None) -> SparkSession:
    """local[N] session with the engine's tuned defaults.

    On a real cluster the same config block ships via spark-submit --conf;
    nothing here is local-mode-specific except the master URL.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cores)))
    b = (
        SparkSession.builder
        .appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    )
    b = _tuned_conf(b)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ship_package(spark)
    return spark


def cluster_session(app_name: str) -> SparkSession:
    """Session for spark-submit entrypoints (jobs/*.py).

    A plain Python script under spark-submit has NO active session —
    only the pyspark shell pre-creates one — so getActiveSession() was
    never a valid spark-submit detector: the jobs silently fell through
    to build_session's .master('local[N]'), overriding --master and
    running the whole job on the driver (review r4). The real signal is
    the submit-provided conf: when spark.master is already set
    (--master / spark-defaults), build with the tuned conf block and NO
    master override so the cluster actually runs the job."""
    from pyspark import SparkConf

    active = SparkSession.getActiveSession()
    if active is not None:
        ship_package(active)
        return active
    if SparkConf().contains("spark.master"):
        spark = _tuned_conf(
            SparkSession.builder.appName(app_name)).getOrCreate()
        ship_package(spark)
        return spark
    return build_session(app_name)


def _tuned_conf(b):
    return (
        b
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Viral-attachment skew in the payload join-back (pipeline.py
        # build_result) is handled by AQE: broadcast when the decoded
        # results are small, OptimizeSkewedJoin partition splitting when
        # sort-merge (verified SortMergeJoin(skew=true) in
        # tests/test_pipeline_skew.py). Pinned on explicitly; at 100 TB
        # tune skewedPartitionThresholdInBytes /
        # advisoryPartitionSizeInBytes to executor memory.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # fat base64 rows: bound Arrow batch memory (SURVEY §7 hard parts)
        # BOTH caps matter: records bounds thin-row batches, bytes bounds
        # fat-payload batches (256 records of 100 MB payloads would
        # otherwise materialize ~25 GB in one Python worker). 64 MB is
        # the Spark 4 default — pinned so the guarantee is explicit.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(DEFAULT.arrow_max_records_per_batch))
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet dynamic partition overwrite = Iceberg overwritePartitions
        # stand-in for idempotent per-bucket resume
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )


_PKG_ZIP_DIR: str | None = None


def package_zip(out_dir: str | None = None) -> str:
    """Zip the pdf_ocr_spark package for --py-files / addPyFile.

    The same artifact a cluster deployment passes to
    ``spark-submit --py-files`` (see jobs/run_extract.py). Default
    output is a per-process temp directory (created once, reused):
    a fixed shared path would let concurrent sessions on one host
    truncate each other's zip while executors fetch it
    (code-review r3)."""
    global _PKG_ZIP_DIR
    import pathlib
    import tempfile
    import zipfile

    pkg_dir = pathlib.Path(__file__).resolve().parent
    if out_dir is None:
        if _PKG_ZIP_DIR is None:
            _PKG_ZIP_DIR = tempfile.mkdtemp(prefix="pdf_ocr_spark_pkg_")
        out_dir = _PKG_ZIP_DIR
    zip_path = str(pathlib.Path(out_dir) / "pdf_ocr_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg_dir.rglob("*.py")):
            zf.write(py, "pdf_ocr_spark/" + str(py.relative_to(pkg_dir)))
    return zip_path


def ship_package(spark: SparkSession) -> None:
    """Make the package importable on executors regardless of cwd —
    the programmatic equivalent of spark-submit --py-files."""
    spark.sparkContext.addPyFile(package_zip())
