"""QUERIES.md (round-4 verdict item #8) stays in lockstep with the
registry: the checked-in index must regenerate byte-identically, and
registry names must be unique and stable-sortable."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_queries_md_current():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "gen_queries_md.py"), "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_registry_names_sane():
    sys.path.insert(0, ROOT)
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert len(qs) >= 154  # append-only: names never vanish between rounds
    assert set(oracles) <= set(qs)
    for name in qs:
        assert name == name.strip() and " " not in name, name
