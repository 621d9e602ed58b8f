"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count + column names + order-insensitive values. Usage:

    python check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from ccdb_data_pipeline_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8, app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failed.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            failed.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount {len(srows)} != {len(orows)}")
            failed.append(name)
            continue
        sk, ok = _rows_key(scols, srows), _rows_key(ocols, orows)
        if sk != ok:
            bad = next(i for i, (a, b) in enumerate(zip(sk, ok)) if a != b)
            print(f"FAIL  {name}: value mismatch at sorted row {bad}:")
            print(f"      spark : {sk[bad]}")
            print(f"      duckdb: {ok[bad]}")
            failed.append(name)
            continue
        print(f"OK    {name}: {len(srows)} rows match")
    spark.stop()
    if failed:
        print(f"\n{len(failed)} FAILED: {failed}")
        return 1
    print("\nall queries match their oracles")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
