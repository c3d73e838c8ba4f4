"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship query on sf0.001
queries()     -> name -> (spark, sf_dir) -> DataFrame, per SURVEY.md §2
oracle_sql()  -> name -> equivalent DuckDB SQL on the same tables

All implementations live in unstract_spark/ (queries.py is the registry);
this module stays a thin adapter so the driver import is cheap.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unstract_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary scan+agg) on /root/testdata/sf0.001."""
    fn = _q.queries()[_q.ENTRY_QUERY]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
