"""Schema evolution: union-merge of target and batch schemas (add + widen).

The reference handles schema change manually — editing field files and
re-projecting positionally (csv2json.py:74-77, s3_utils.py:147-148; the
v1->v2 fixture pair adds ``event_tag``). Here evolution is automatic:
column adds are unioned in (old rows read back as null) and integer/float
types widen (int32->int64, float->double), mirroring Iceberg's schema-union
merge rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# numeric widening lattice (Spark simpleString name -> rank within family)
_INT_RANK = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}
_INT_TYPE = [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()]
_FLOATY = {"float", "double"}


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    sa, sb = a.simpleString(), b.simpleString()
    if sa in _INT_RANK and sb in _INT_RANK:
        return _INT_TYPE[max(_INT_RANK[sa], _INT_RANK[sb])]
    if (sa in _FLOATY or sa in _INT_RANK) and (sb in _FLOATY or sb in _INT_RANK):
        return T.DoubleType()
    raise TypeError(f"incompatible schema evolution: {sa} vs {sb}")


def evolve_schema(target: T.StructType, batch: T.StructType) -> T.StructType:
    """Union of fields; shared fields widen; new batch fields append (nullable).
    Dropping columns is NOT evolution — missing batch columns stay, null-filled."""
    out: list[T.StructField] = []
    batch_by_name = {f.name: f for f in batch.fields}
    for f in target.fields:
        if f.name in batch_by_name:
            out.append(T.StructField(f.name, _widen(f.dataType, batch_by_name[f.name].dataType), f.nullable or batch_by_name[f.name].nullable))
        else:
            out.append(T.StructField(f.name, f.dataType, True))
    tnames = {f.name for f in target.fields}
    for f in batch.fields:
        if f.name not in tnames:
            out.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(out)


def strict_to_timestamp(c, fmt: str | None = None):
    """F1 parity with the reference's raising ``ensure_date``
    (/root/reference/salesforce/query.py:28-29, tested at
    salesforce/tests/test_query.py:13-16): a NON-NULL value that fails to
    parse raises (failing the job) instead of silently casting to null, so a
    malformed timestamp is never indistinguishable from an absent one.
    Nulls pass through as nulls."""
    c = F.col(c) if isinstance(c, str) else c
    # try_to_timestamp nulls on bad input in BOTH ANSI modes, so the raise
    # below is ours (stable message) rather than an ANSI-mode-dependent cast
    parsed = F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)
    bad = c.isNotNull() & parsed.isNull()
    err = F.concat(F.lit("unparseable timestamp: '"), c.cast("string"), F.lit("'"))
    return F.when(bad, F.raise_error(err).cast("timestamp")).otherwise(parsed)


def align_to_schema(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project/cast df to exactly ``schema`` (missing columns -> null).
    Extra df columns not in schema are preserved at the end (engine
    bookkeeping columns ride along)."""
    names = {f.name for f in schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in df.columns:
            cur = df.schema[f.name].dataType
            c = F.col(f.name)
            cols.append(c.cast(f.dataType).alias(f.name) if cur != f.dataType else c)
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    extras = [F.col(c) for c in df.columns if c not in names]
    return df.select(*cols, *extras)


def classify_compat(table: T.StructType, producer: T.StructType) -> dict:
    """Producer-schema admission gate: classify what APPLYING a feed with
    ``producer``'s shape to a table with ``table``'s shape would mean,
    BEFORE any data moves — the schema-registry compatibility check a CDC
    pipeline runs when a new producer version shows up (the reference's
    analog is the strict positional arity check, csv2json.py:46-52, which
    can only hard-fail; this one says WHAT would change).

    Returns ``{"verdict": ..., "adds": [...], "widens": [(name, from, to)],
    "narrows": [...], "conflicts": [(name, table_t, producer_t)],
    "missing": [...]}`` where verdict is:

    - ``"identical"``    — same fields, same types (order ignored);
    - ``"compatible"``   — applying evolves the table losslessly: new
      nullable columns and/or numeric widenings only. ``missing`` producer
      columns are fine (null-filled), matching evolve_schema;
    - ``"incompatible"`` — at least one type conflict outside the widening
      lattice, or a producer type NARROWER than the table's (admitting it
      would silently widen producer data into the table type — allowed —
      BUT a narrower producer is still compatible; only cross-family
      conflicts are fatal).
    """
    tmap = {f.name: f.dataType for f in table.fields}
    pmap = {f.name: f.dataType for f in producer.fields}
    adds = sorted(set(pmap) - set(tmap))
    missing = sorted(set(tmap) - set(pmap))
    widens, narrows, conflicts = [], [], []
    for name in sorted(set(tmap) & set(pmap)):
        a, b = tmap[name], pmap[name]
        if a == b:
            continue
        try:
            w = _widen(a, b)
        except TypeError:
            conflicts.append((name, a.simpleString(), b.simpleString()))
            continue
        if w == a:
            narrows.append((name, a.simpleString(), b.simpleString()))
        else:
            widens.append((name, a.simpleString(), b.simpleString()))
    if conflicts:
        verdict = "incompatible"
    elif adds or widens or narrows or missing:
        verdict = "compatible"
    else:
        verdict = "identical"
    return {
        "verdict": verdict,
        "adds": adds,
        "missing": missing,
        "widens": widens,
        "narrows": narrows,
        "conflicts": conflicts,
    }


def require_compat(table: T.StructType, producer: T.StructType) -> dict:
    """Admission gate that RAISES on an incompatible producer (the strict
    mode a production relay runs before letting a new producer version
    write), returning the classification otherwise."""
    rep = classify_compat(table, producer)
    if rep["verdict"] == "incompatible":
        raise TypeError(
            "incompatible producer schema: "
            + ", ".join(f"{n}: {a} vs {b}" for n, a, b in rep["conflicts"])
        )
    return rep
