import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from pdf_ocr_spark.session import build_session
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = build_session("pdf-ocr-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def unit_transcripts(tmp_path_factory):
    from pdf_ocr_spark.fixtures import generate_transcripts
    path = str(tmp_path_factory.mktemp("fixtures") / "transcripts_unit.parquet")
    n = generate_transcripts(path, tier="unit")
    assert n > 0
    return path
