"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``gush_spark.queries`` (batch/oracle-checkable
operators); streaming/CEP behavior is verified by ``tests/``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from gush_spark import queries as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: event-time tumbling
    windowed count per event kind (the WindowedInsertCount analog,
    reference cep/Cep.scala:29-35, run as batch)."""
    return _catalog.q_tumbling_window_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _catalog.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same aliases ⇒ same hash)."""
    return _catalog.all_oracles()
