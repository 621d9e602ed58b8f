"""Text / field normalization — vectorized pandas UDFs, zero per-row Python.

Re-creates:
- whitespace collapse on the narrative: ``" ".join(row[5].split())``
  (/root/reference/common/s3_utils.py:144-145) — here an Arrow-batched
  pandas UDF so the 100 TB hot path never crosses into row-at-a-time Python;
- empty-string -> null normalization with the narrative carve-out:
  the reference nulls every "" field, then restores
  ``complaint_what_happened`` (/root/reference/complaints/ccdb/index_ccdb.py:32-36);
- the derived has-narrative boolean (index_ccdb.py:26-29);
- dedup hashing: built-in ``xxhash64`` / ``sha2`` (JVM-side, no UDF at all).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TableSpec


# rows whose text would be CHANGED by " ".join(s.split()): any leading or
# trailing whitespace, any doubled space, or any whitespace char that is not
# a plain space (tab/newline/unicode). Everything else is already normal —
# the split/join (the expensive part, ~40us/row on kilobyte texts) runs only
# on the small matching fraction.
_WS_IRREGULAR = r"^\s|\s$|\s\s|[^\S ]"


def _normalize_ws_series(s: pd.Series) -> pd.Series:
    needs = s.notna() & s.str.contains(_WS_IRREGULAR, regex=True, na=False)
    if not needs.any():
        return s
    out = s.copy()
    out[needs] = s[needs].str.split().str.join(" ")
    return out


@F.pandas_udf(T.StringType())
def normalize_ws(s: pd.Series) -> pd.Series:
    """Collapse unicode whitespace runs to single spaces and trim — exact
    semantics of Python ``" ".join(s.split())`` (s3_utils.py:144-145),
    vectorized over Arrow batches. Nulls pass through; "" stays ""."""
    return _normalize_ws_series(s)


def normalize_ws_sql(c: Column) -> Column:
    """JVM-only equivalent for ASCII whitespace (regexp path) — used where a
    DuckDB-oracle-comparable expression is preferred over the UDF."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def empty_to_null(df: DataFrame, spec: TableSpec) -> DataFrame:
    """""->null for payload string columns except the carve-outs."""
    out = df
    for f in df.schema.fields:
        if (
            f.dataType.simpleString() == "string"
            and f.name not in spec.empty_to_null_exempt
            and f.name not in (spec.op_col, *spec.key_cols)
        ):
            out = out.withColumn(f.name, F.when(F.col(f.name) == "", None).otherwise(F.col(f.name)))
    return out


def normalize_payload(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Full normalization pass: ""->null (with carve-out) + whitespace
    collapse on the configured text columns."""
    out = empty_to_null(df, spec)
    for c in spec.normalize_ws_cols:
        if c in out.columns:
            out = out.withColumn(c, normalize_ws(F.col(c)))
    return out


def normalize_pandas_frame(pdf: pd.DataFrame, spec: TableSpec, payload_str_cols: list[str]) -> pd.DataFrame:
    """The SAME normalization policy as normalize_payload, applied to a
    pandas frame inside an Arrow batch (shared by the fused mapInPandas
    apply path so the two code paths cannot drift): ""->null for payload
    string columns except the carve-outs; whitespace collapse on the
    configured text columns."""
    for c in payload_str_cols:
        if c in spec.empty_to_null_exempt or c not in pdf.columns:
            continue
        col = pdf[c]
        mask = col.notna() & (col == "")
        if mask.any():
            pdf.loc[mask, c] = None
    for c in spec.normalize_ws_cols:
        if c in pdf.columns:
            pdf[c] = _normalize_ws_series(pdf[c])
    return pdf


# Python's str.split() whitespace set (what " ".join(s.split()) splits on):
# the Unicode White_Space property. Spelled out as an explicit RE2 character
# class so the Arrow-native path (pyarrow.compute uses RE2, whose \s is
# ASCII-only) normalizes EXACTLY like the pandas path's str.split().
_PY_WS = (
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000"
)
_WS_RUN_RE2 = f"[{_PY_WS}]+"
# rows whose text would be CHANGED by " ".join(s.split()) — RE2 spelling of
# _WS_IRREGULAR above (RE2 has no [^\S ] double negative)
_WS_IRREGULAR_RE2 = (
    f"^[{_PY_WS}]|[{_PY_WS}]$|[{_PY_WS}][{_PY_WS}]|[{_PY_WS.replace(' ', '')}]"
)


def normalize_arrow_table(tbl, spec: TableSpec, payload_str_cols: list[str]):
    """The SAME normalization policy as normalize_pandas_frame, applied to a
    pyarrow Table with pyarrow.compute kernels only — the zero-pandas hot
    path used by the mapInArrow fused fold. Strings never materialize as
    Python objects: ""->null is a vectorized equal/if_else, whitespace
    collapse is one RE2 pass (run only when the partition actually contains
    an irregular value — the common all-regular case costs one match pass)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    names = tbl.column_names
    for c in payload_str_cols:
        if c in spec.empty_to_null_exempt or c not in names:
            continue
        col = tbl.column(c)
        empty = pc.equal(col, "")
        if pc.any(empty).as_py():
            tbl = tbl.set_column(
                names.index(c), c, pc.if_else(empty, pa.scalar(None, col.type), col)
            )
    for c in spec.normalize_ws_cols:
        if c not in names:
            continue
        col = tbl.column(c)
        needs = pc.match_substring_regex(col, _WS_IRREGULAR_RE2)
        if not pc.any(needs).as_py():
            continue
        collapsed = pc.utf8_trim(
            pc.replace_substring_regex(col, pattern=_WS_RUN_RE2, replacement=" "),
            characters=" ",
        )
        tbl = tbl.set_column(names.index(c), c, pc.if_else(needs, collapsed, col))
    return tbl


def normalize_payload_jvm(df: DataFrame, spec: TableSpec, payload_str_cols: list[str]) -> DataFrame:
    """The SAME normalization policy as normalize_pandas_frame /
    normalize_arrow_table, expressed as pure JVM Catalyst expressions (no
    Python worker at all) — used by the fold_engine="jvm" apply path. The
    whitespace class is the explicit ``_PY_WS`` spelling (Java regex treats
    the class chars literally, same set RE2 and pandas use), so all three
    engines normalize byte-identically: strip leading/trailing unicode
    whitespace, collapse inner runs to single spaces; ""->null first (same
    order as the other engines: an all-whitespace string collapses to "",
    not null)."""
    cols = {}
    for c in payload_str_cols:
        if c in spec.empty_to_null_exempt or c not in df.columns:
            continue
        cols[c] = F.when(F.col(c) == "", None).otherwise(F.col(c))
    for c in spec.normalize_ws_cols:
        if c not in df.columns:
            continue
        base = cols.get(c, F.col(c))
        stripped = F.regexp_replace(base, f"^[{_PY_WS}]+|[{_PY_WS}]+$", "")
        cols[c] = F.regexp_replace(stripped, _WS_RUN_RE2, " ")
    if not cols:
        return df
    return df.select(
        *[cols.get(c, F.col(c)).alias(c) for c in df.columns]
    )


def has_text(c: Column) -> Column:
    """has_narrative analog (index_ccdb.py:26-29)."""
    return c.isNotNull() & (c != "")


def text_hash(c: Column) -> Column:
    """64-bit dedup hash of normalized text — built-in xxhash64 (no UDF)."""
    return F.xxhash64(normalize_ws_sql(c))
