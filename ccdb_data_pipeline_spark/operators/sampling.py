"""Deterministic sampling operators.

The reference's dev-subset knob is ``MAX_RECORDS`` — a head-N truncation
(`/root/reference/.env_example:7-8`, applied as a row limit in
`common/csv2json.py:94-95`). A head sample is biased by file order and not
reproducible across re-partitioned inputs; at 100 TB the engine needs a
sample that is (a) a pure map-side filter — no shuffle, no coordination,
(b) stable under re-runs, re-partitioning, and cluster size, and (c)
consistent across tables (the same key always lands in or out, so sampled
fact/dim tables still join).

``hash_sample`` keys the decision on a cryptographic digest of the sample
key (md5 — available and bit-identical in Spark, DuckDB, and every warehouse,
so oracle checks and cross-engine reproducibility are exact), compared
against a fixed-width hex threshold. Rate granularity is 1/65536.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WIDTH = 4  # hex chars compared -> 16-bit granularity


def hash_threshold(rate: float) -> str:
    """Inclusive upper bound on the first 4 md5 hex chars for a given rate.

    Returns '' for rate <= 0 (selects nothing, '' < any digest prefix).
    """
    if rate <= 0.0:
        return ""
    n = min(65536, max(1, round(rate * 65536)))
    return format(n - 1, f"0{_WIDTH}x")


def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Deterministic ~rate sample keyed on ``key_col``.

    A row survives iff md5(cast(key as string))[:4] <= threshold(rate).
    Map-side only: the filter is pushed into the scan, no shuffle, and the
    same keys survive regardless of parallelism — the reproducible analog
    of the reference's MAX_RECORDS dev subset.
    """
    digest = F.md5(F.col(key_col).cast("string"))
    return df.filter(digest.substr(1, _WIDTH) <= hash_threshold(rate))


def dataset_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic weighted corpus MIXING: per-source sampling rates in
    one map-side filter (the multi-source generalization of hash_sample —
    the knob every LLM training mix turns: upsample the curated source,
    downsample the crawl).

    Each row survives iff md5(key)[:4] <= threshold(rate-of-its-source);
    sources absent from ``rates`` fall back to ``default_rate``. Because
    the decision is a pure function of (key, source), the mix is a
    reproducible dataset DEFINITION rather than a sampling run: stable
    under re-partitioning, cluster size, and re-execution, and consistent
    across derived tables keyed on the same id. No shuffle at any scale —
    the CASE collapses to a codegen'd branch riding the scan."""
    expr = F.lit(hash_threshold(default_rate))
    for s, r in sorted(rates.items(), reverse=True):
        expr = F.when(F.col(source_col) == s, F.lit(hash_threshold(r))).otherwise(expr)
    digest = F.md5(F.col(key_col).cast("string"))
    return df.filter(digest.substr(1, _WIDTH) <= expr)


def decay_sample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    anchor: str,
    halflife_days: int,
) -> DataFrame:
    """Deterministic recency-weighted sampling: the keep probability HALVES
    every ``halflife_days`` before ``anchor`` (step decay — the curriculum
    knob that biases a training mix toward fresh data without discarding
    history outright).

    Exact integer arithmetic end to end, so the same keys survive on every
    engine and partitioning: the row's 16-bit md5 prefix is compared to
    ``65536 >> k`` where ``k = floor(age_days / halflife)`` (capped at 16 —
    beyond ~16 half-lives nothing survives 16-bit granularity anyway).
    No float pow(), whose last-ulp differences across engines would flip
    boundary rows. Rows with ts after the anchor decay as age 0 (rate 1);
    null ts drops (age unknowable -> not sampleable reproducibly).
    Map-side only, like every sampler in this module.
    """
    if halflife_days <= 0:
        raise ValueError(f"halflife_days must be positive, got {halflife_days}")
    # explicit: Spark's greatest() SKIPS nulls, so without this guard a
    # null ts would silently decay as age 0 and always survive
    df = df.filter(F.col(ts_col).isNotNull())
    age = F.greatest(
        F.datediff(F.lit(anchor).cast("date"), F.col(ts_col).cast("date")), F.lit(0)
    )
    k = F.least(F.floor(age / F.lit(halflife_days)), F.lit(16)).cast("int")
    u16 = F.conv(F.md5(F.col(key_col).cast("string")).substr(1, 4), 16, 10).cast("long")
    # threshold = 65536 >> k, integer-exact (shiftright takes only a
    # literal shift in the python DSL, so the column form goes via expr)
    return (
        df.withColumn("_decay_k", k)
        .filter(u16 < F.expr("shiftright(65536L, _decay_k)"))
        .drop("_decay_k")
    )
