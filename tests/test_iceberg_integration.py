"""Conditional Iceberg-runtime integration (round-4 verdict item #6): the
golden files pin the SQL text jar-free (test_iceberg_sql_goldens); THIS
test actually executes it — create / merge / compact for each engine
table spec through plans/iceberg.py against a real hadoop-catalog
warehouse, state-equal to a SnapshotParquetTable twin — whenever an
iceberg-spark runtime jar can be found. Self-skips cleanly in this
sandbox (no jar, no network; documented ``--packages`` bootstrap in
plans/iceberg.py and scripts/iceberg_parity_check.py). Runs the check in
a SUBPROCESS because the Iceberg session extensions must be set before
the JVM starts."""

import glob
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_iceberg_jar() -> str | None:
    if os.environ.get("ICEBERG_JAR") and os.path.exists(os.environ["ICEBERG_JAR"]):
        return os.environ["ICEBERG_JAR"]
    candidates = []
    try:
        import pyspark

        candidates.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except Exception:
        pass
    if os.environ.get("SPARK_HOME"):
        candidates.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    candidates.append(os.path.expanduser("~/.ivy2"))
    for base in candidates:
        hits = glob.glob(
            os.path.join(base, "**", "iceberg-spark-runtime*.jar"), recursive=True
        )
        if hits:
            return sorted(hits)[-1]
    return None


def test_iceberg_runtime_parity_all_engines():
    jar = _find_iceberg_jar()
    if jar is None:
        pytest.skip(
            "no iceberg-spark-runtime jar on this machine (sandbox has no "
            "network); bootstrap: spark-submit --packages "
            "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> "
            "scripts/iceberg_parity_check.py"
        )
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "iceberg_parity_check.py"),
         "--jar", jar],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "PARITY OK" in r.stdout
