"""Grouped-aggregate pandas UDF (the UDAF surface, SURVEY 2.8).

The engine's stance is that grouped logic should be window functions or
builtin aggregates whenever one exists (`operators/dedupe.py` replaces the
obvious UDAF with `max_by`). This module covers the residual case: an
aggregate Spark has NO builtin for — median absolute deviation, the robust
dispersion statistic quality-monitoring dashboards want (stddev is blown
up by a single pathological document; MAD is not).

A grouped-agg `pandas_udf` receives each group's column as one Arrow batch
and returns a scalar — partial aggregation is impossible (medians don't
merge), so Spark shuffles the raw column to the group's reducer. That is
the honest cost of any exact rank statistic; the column shipped is a
single int64, pruned before the exchange. For merge-friendly approximate
dispersion at 100 TB, `percentile_approx`-based IQR is the alternative
(see `distinct_quantiles`); this UDAF is the exact path.

Reference analog: the reference's per-row strategy functions
(`complaints/ccdb/index_ccdb.py:97` transform_fn) are the extension
surface this generalizes — vectorized, per the input_hint's
no-per-row-Python mandate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# DataType instance, not a DDL string: string return types are parsed
# against the active session at decoration time, which would make this
# module unimportable before a SparkSession exists.
@pandas_udf(DoubleType())
def mad(v: pd.Series) -> float:
    """Exact median absolute deviation: median(|x - median(x)|).

    pandas' median is the same linear interpolation DuckDB's ``mad()``
    uses, so the DuckDB oracle reproduces the value bit-for-bit on int64
    input (midpoints are exact halves in binary floating point).
    """
    med = v.median()
    return float((v - med).abs().median())


def mad_of(col) -> F.Column:
    """Aggregate-expression form: ``df.groupBy(...).agg(mad_of(col))``."""
    return mad(col)
