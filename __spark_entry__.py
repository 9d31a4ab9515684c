"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (BFS wave expansion — the crawl
engine's core semantics) on sf0.001.  ``queries``/``oracle_sql`` expose
the operator inventory from SURVEY.md §2 plus the training-data
pipeline suite (dedup / similarity / text analysis), each paired with a
DuckDB-runnable ANSI-SQL oracle over the same parquet tables.

The full crawl engine itself (priority frontier, robots, politeness,
bloom seen-set, checkpointed waves) is exercised against its own
pure-Python BFS oracle in tests/ — see lopez_spark/crawler/ and
tests/test_crawl_parity.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lopez_spark.plans.driver_queries import QUERIES, resolved_oracles  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["bfs_wave2"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column aliases)."""
    return resolved_oracles()
