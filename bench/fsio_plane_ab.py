"""A/B: driver Arrow plane vs distributed mapInArrow plane on a
registered filesystem scheme (round-5 item #1). Same store shape, same
seed, same two merge batches — the only difference is whether the
scheme's registration carries a picklable factory.

The interesting axis is CORE SCALING, not single-box latency: the
driver plane funnels every byte of job output through one process
(collect via ``toArrow``), so adding executor cores cannot help it; the
distributed plane runs the parquet jobs as tasks. Each (plane, cores)
cell runs in its OWN taskset-pinned subprocess (the bench/scaling.py
protocol — without pinning, local[2] leaks runtime threads onto every
host core and no configuration has scaling headroom).

Prints one JSON line:
  {"bench": "fsio_plane_ab",
   "driver": {"c2_events_per_sec": ., "c8_events_per_sec": ., "speedup_2_to_8": .},
   "dist": {...}, "n_events": N}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCHEME = "abfactory"


def _register(base: str, with_factory: bool) -> None:
    import pyarrow.fs as pafs

    from ccdb_data_pipeline_spark.plans import fsio

    def factory(base=base):
        import pyarrow.fs as pafs

        return pafs.SubTreeFileSystem(base, pafs.LocalFileSystem())

    def cput(p, raw, base=base):
        full = os.path.join(base, p)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        try:
            fd = os.open(full, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise fsio.ExclusiveCreateError(p)
        try:
            os.write(fd, raw)
        finally:
            os.close(fd)

    fsio.register_filesystem(
        SCHEME, factory(), conditional_put=cput,
        factory=factory if with_factory else None,
    )


def child(cores: int, with_factory: bool, n_events: int) -> None:
    """One pinned measurement: bootstrap + 2 merges on a fresh store."""
    import numpy as np

    from ccdb_data_pipeline_spark.plans.apply import apply_changes, bootstrap_seed
    from ccdb_data_pipeline_spark.plans.lake import SnapshotParquetTable
    from ccdb_data_pipeline_spark.schemas import (
        CHANGE_SCHEMA,
        TRANSCRIPT_SCHEMA,
        TableSpec,
    )
    from ccdb_data_pipeline_spark.session import build_session
    from ccdb_data_pipeline_spark.sources.binlog import (
        gen_changes_pandas,
        gen_seed_pandas,
    )

    n_convs = max(1000, n_events // 100)
    seed_pd = gen_seed_pandas(n_convs=n_convs, seed=11)
    ch = gen_changes_pandas(n_events, n_convs=n_convs, seed=11)
    chunks = [c.reset_index(drop=True) for c in np.array_split(ch, 2)]
    base = tempfile.mkdtemp(prefix="fsio-ab-store-")
    _register(base, with_factory)
    spark = build_session(
        app_name="fsio-ab", master=f"local[{cores}]",
        shuffle_partitions=max(8, cores),
    )
    try:
        t = SnapshotParquetTable(
            spark, f"{SCHEME}://tbl",
            TableSpec(num_buckets=16, merge_mode="mor"),
        )
        t.create(TRANSCRIPT_SCHEMA)
        seed_df = spark.createDataFrame(seed_pd, TRANSCRIPT_SCHEMA)
        ch_dfs = [spark.createDataFrame(c, CHANGE_SCHEMA) for c in chunks]
        # warmup: one throwaway apply on a scratch table spins up the
        # python worker pool so the timed window measures the planes
        warm = SnapshotParquetTable(
            spark, f"{SCHEME}://warm", TableSpec(num_buckets=16, merge_mode="mor")
        )
        warm.create(TRANSCRIPT_SCHEMA)
        apply_changes(warm, ch_dfs[0].limit(20000), batch_id=0)
        t0 = time.monotonic()
        bootstrap_seed(t, seed_df)
        for i, df in enumerate(ch_dfs):
            apply_changes(t, df, batch_id=i)
        dt = time.monotonic() - t0
        print(json.dumps({"events_per_sec": n_events / dt}))
    finally:
        spark.stop()
        shutil.rmtree(base, ignore_errors=True)


def run_cell(cores: int, with_factory: bool, n_events: int, reps: int = 2) -> float:
    best = 0.0
    for _ in range(reps):
        cmd = [
            "taskset", "-c", f"0-{cores - 1}", sys.executable,
            os.path.abspath(__file__), "--child", str(cores),
            str(int(with_factory)), str(n_events),
        ]
        res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=1800)
        line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
        best = max(best, json.loads(line)["events_per_sec"])
    return best


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), bool(int(sys.argv[3])), int(sys.argv[4]))
        return
    n_events = int(os.environ.get("FSIO_AB_EVENTS", "1000000"))
    out = {"bench": "fsio_plane_ab", "n_events": n_events}
    for label, with_factory in (("driver", False), ("dist", True)):
        c2 = run_cell(2, with_factory, n_events)
        c8 = run_cell(8, with_factory, n_events)
        out[label] = {
            "c2_events_per_sec": round(c2),
            "c8_events_per_sec": round(c8),
            "speedup_2_to_8": round(c8 / c2, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
