"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: XYGrid tile assignment + cell-cell hash join over
                 points derived from the sf0.001 events table.
queries()      — operator inventory (SURVEY.md §2 + training-data ops), each
                 over the driver's parquet tables at the given sf_dir.
oracle_sql()   — matching DuckDB SQL oracles (independent SQL re-derivation
                 of each operator's semantics; identical column aliases).

Implementation lives in oshdb_spark/driver_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oshdb_spark import driver_queries as _dq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _dq.REGISTRY["cell_hash_join"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _dq.queries()


def oracle_sql() -> dict[str, str]:
    return _dq.oracle_sql()
