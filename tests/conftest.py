import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from gush_spark.session import build_session

    spark = build_session("gush_spark_tests", cores=4, shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture()
def tmp_dirs(tmp_path):
    return {
        "sink": str(tmp_path / "sink"),
        "checkpoint": str(tmp_path / "ckpt"),
        "data": str(tmp_path / "data"),
        "lineage": str(tmp_path / "lineage.jsonl"),
    }
