"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC merge-apply on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md section 2
(+ training-data ops); ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL
for each (omitted only for genuinely non-SQL-expressible ops, which the
driver checks rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ccdb_data_pipeline_spark.benchqueries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC merge-apply (seed snapshot + delta with deletes -> LWW
    final state) over the sf0.001 events table."""
    return QUERIES["cdc_merge_apply"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
