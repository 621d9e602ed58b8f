"""Z-order (Morton-curve) multi-column clustering.

Key-sorted compaction (``compact(sort_within_bucket=True)``) makes parquet
row-group stats tight on the TABLE KEY only: a time-range scan over a
key-sorted bucket overlaps every row group, because each group spans the
full ts range. Z-ordering interleaves the bits of several normalized
columns so rows close in ANY clustered dimension land close in the file —
row-group min/max stats become partially tight on every clustered column
at once, and Spark's pushed-down parquet filters (key equality AND
time-range alike) skip row groups instead of reading them.

This is the rewrite_data_files sort-order analog Delta/Iceberg expose as
ZORDER BY. Everything here is JVM expression code (shift/and/add — inside
whole-stage codegen); the only extra job is one min/max agg over the
rewrite input to normalize each column to ``bits``-bit space.

The curve math (bit interleave over rank-normalized columns) follows the
standard published construction (Morton 1966; Delta OPTIMIZE ZORDER BY)
— no reference-engine analog exists (the reference keeps no columnar
files at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: chars of the order-preserving string prefix (7 * 8 bits < 63, no overflow)
_PREFIX_CHARS = 7


def str_prefix_long(c: Column) -> Column:
    """Order-preserving long from a string's first 7 chars (ASCII byte math;
    codepoints are capped at 255 so non-ASCII text stays monotone per byte).
    rpad with NUL keeps 'abc' < 'abcd' ordering intact."""
    p = F.rpad(F.coalesce(c, F.lit("")), _PREFIX_CHARS, "\x00")
    out = F.lit(0).cast("long")
    for i in range(_PREFIX_CHARS):
        byte = F.least(F.ascii(F.substring(p, i + 1, 1)), F.lit(255)).cast("long")
        out = out + F.shiftleft(byte, 8 * (_PREFIX_CHARS - 1 - i))
    return out


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` already-normalized ``bits``-bit
    longs. Bit i of column j lands at position i*n + (n-1-j); the terms are
    disjoint so plain addition assembles the word (codegen-friendly: no
    fold over bitwiseOR)."""
    n = len(cols)
    assert n * bits <= 62, "z-value must fit a signed long"
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + (n - 1 - j))
    return z


def _as_long(df: DataFrame, name: str) -> Column:
    dt = dict(df.dtypes)[name]
    if dt == "string":
        return str_prefix_long(F.col(name))
    if dt.startswith("timestamp"):
        return F.unix_timestamp(F.col(name)).cast("long")
    if dt == "date":
        return F.datediff(F.col(name), F.lit("1970-01-01")).cast("long")
    return F.col(name).cast("long")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Z-value column over ``cols``: each column is mapped to a long
    (strings via order-preserving prefix, timestamps via epoch seconds),
    min-max normalized to ``bits``-bit space with ONE agg job over ``df``,
    then bit-interleaved. Nulls normalize to the column minimum (sort
    first — the same place a plain ORDER BY puts them)."""
    longs = [_as_long(df, c) for c in cols]
    row = df.agg(
        *[f for c in longs for f in (F.min(c), F.max(c))]
    ).first()
    scaled = []
    top = (1 << bits) - 1
    for j, c in enumerate(longs):
        lo = row[2 * j] if row[2 * j] is not None else 0
        hi = row[2 * j + 1] if row[2 * j + 1] is not None else 0
        span = max(1, hi - lo)
        # double intermediate: exact for spans < 2^53, immune to long overflow
        scaled.append(
            F.floor((F.coalesce(c, F.lit(lo)) - F.lit(lo)) * (float(top) / span))
            .cast("long")
        )
    return interleave_bits(scaled, bits)


def zvalue_py(vals: list[int], bits: int = 16) -> int:
    """Driver-side reference implementation (tests / oracle generation)."""
    n = len(vals)
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z += ((v >> i) & 1) << (i * n + (n - 1 - j))
    return z


def interleave_sql(exprs: list[str], bits: int = 16) -> str:
    """ANSI-SQL text of the same interleave (DuckDB oracle generation):
    sum of disjoint shifted bits, mirroring interleave_bits exactly."""
    n = len(exprs)
    terms = []
    for j, e in enumerate(exprs):
        for i in range(bits):
            # fully parenthesized: DuckDB binds << tighter than &, so the
            # C-style "(x & 1) << p" would parse as "x & (1 << p)" otherwise
            terms.append(f"(((({e}) >> {i}) & 1) << {i * n + (n - 1 - j)})")
    return "(" + " + ".join(terms) + ")"
