"""Regenerate QUERIES.md — the stable query-name index (round-4 verdict
item #8): one row per registered `queries()` entry with its oracle kind,
so driver rounds can rotate correctness sampling over byte-stable names.

    python scripts/gen_queries_md.py          # rewrites QUERIES.md
    python scripts/gen_queries_md.py --check  # exit 1 if stale
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render() -> str:
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    lines = [
        "# QUERIES — stable registry index",
        "",
        "One row per `queries()` entry in `__spark_entry__.py` (source:",
        "`ccdb_data_pipeline_spark/benchqueries.py`). Names and oracle SQL are",
        "kept BYTE-STABLE across rounds so the driver's correctness sampling",
        "can rotate coverage; regenerate with `python scripts/gen_queries_md.py`",
        "(CI-checkable via `--check`).",
        "",
        "Oracle kind: **sql** = full DuckDB value-hash oracle in",
        "`oracle_sql()`; **rows-only** = non-SQL-expressible op, the driver",
        "records the weaker rows/schema check.",
        "",
        f"Total: {len(qs)} queries, {len(oracles)} with SQL oracles.",
        "",
        "| # | query | oracle | summary |",
        "|---|---|---|---|",
    ]
    for i, name in enumerate(sorted(qs), 1):
        fn = qs[name]
        doc = (getattr(fn, "__doc__", None) or "").strip().splitlines()
        summary = doc[0].strip() if doc else ""
        if len(summary) > 110:
            summary = summary[:107] + "..."
        kind = "sql" if name in oracles else "rows-only"
        lines.append(f"| {i} | `{name}` | {kind} | {summary} |")
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "QUERIES.md")
    text = render()
    if "--check" in sys.argv:
        with open(out) as f:
            if f.read() != text:
                print("QUERIES.md is stale: run python scripts/gen_queries_md.py")
                return 1
        print("QUERIES.md up to date")
        return 0
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
