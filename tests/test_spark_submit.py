"""North-rule packaging check: the engine runs under spark-submit
--py-files from a clean working directory, importing ONLY from the zip.

(The reference ships as a pip-installed console entrypoint run by cron /
Jenkins, setup.py:22-27; the Spark-cluster analog is spark-submit with a
--py-files artifact.)
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

from ccdb_data_pipeline_spark.sources.binlog import (
    gen_changes_pandas,
    gen_seed_pandas,
    write_segments,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_ingest(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package_pyfiles import build

    zip_path = build(str(tmp_path / "engine.zip"), repo_root=REPO)

    seed = gen_seed_pandas(n_convs=30, seed=7)
    changes = gen_changes_pandas(600, n_convs=30, seed=7)
    import pyarrow as pa
    import pyarrow.parquet as pq

    seed_dir = tmp_path / "seed"
    seed_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(seed, preserve_index=False),
                   str(seed_dir / "part-0.parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    write_segments(changes, str(tmp_path / "binlog"), n_segments=4,
                   replay_segment=None)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env["SPARK_DRIVER_MEM"] = "4g"
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_smoke.py"),
         str(tmp_path / "table"), str(seed_dir), str(tmp_path / "binlog"),
         str(tmp_path / "ckpt")],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    result = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert result["last_lsn"] == 600
    assert result["batches"] == [0, 1]

    # value check against the sequential oracle
    from tests.oracle import replay

    expected = replay(seed, [changes])
    assert result["rows"] == len(expected)
