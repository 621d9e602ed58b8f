"""Table integrity audit (``fsck``): verify that the metadata layer and the
bytes on disk still agree — the offline counterpart of the write-path
audits (publish row-floor, ledger gate).

Real deployments run this after infra incidents (partial restores, object
store lifecycle misfires, manual surgery) and before promoting a replica:
it answers "can every retained snapshot still be served, and do the files
still contain what the manifests claim?" without reading any data pages.

Checks, cheapest first:

1. **ref resolution** — HEAD, every branch ref and every tag point at a
   manifest that exists;
2. **file existence** — every data file referenced by any retained manifest
   is present on disk;
3. **schema-era closure** — every file entry's ``schema_id`` resolves in its
   manifest's schema registry (an unreadable era would fail at read time);
4. **footer agreement** (current manifest, per ref) — the per-file
   ``n_rows`` / LSN range recorded at write time match the parquet footer
   NOW (bit-rot / truncated upload / wrong-file restore detection).
   Footer-only reads, executor-parallel above the driver threshold — the
   same machinery the write path uses (``_footer_scan``);
5. **ledger sanity** — no duplicate batch_id, and the ledger's high LSN
   watermark is not AHEAD of the manifests' (a ledger claiming more than
   the data shows means lost files).

Returns ``{"ok": bool, "violations": [...], ...counts}``; never mutates.
"""

from __future__ import annotations

import json
import os

from . import fsio
from .lake import SnapshotParquetTable, _dv_key
from .lineage import lineage_rows


def fsck(table: SnapshotParquetTable, verify_footers: bool = True) -> dict:
    v: list[dict] = []
    root = table.root

    def bad(kind: str, **kw) -> None:
        v.append({"kind": kind, **kw})

    # 1. refs -> manifests
    refs: dict[str, int] = {"HEAD": table.current_version()}
    refs.update({f"branch:{n}": ver for n, ver in table.branches().items()})
    refs.update({f"tag:{n}": ver for n, ver in table.tags().items()})
    for name, ver in refs.items():
        if not fsio.exists(table._manifest_path(ver)):
            bad("dangling_ref", ref=name, version=ver)

    # 2+3. every retained manifest's files exist, schema eras resolve
    mdir = os.path.join(root, "manifests")
    manifests: list[dict] = []
    seen_paths: set[str] = set()
    seen_dv: set[str] = set()
    n_files = 0
    for fn in fsio.listdir(mdir):
        if not (fn.startswith("m-") and fn.endswith(".json")):
            continue
        try:
            m = json.loads(fsio.read_text(os.path.join(mdir, fn)))
        except (OSError, json.JSONDecodeError) as ex:
            bad("unreadable_manifest", manifest=fn, error=str(ex))
            continue
        manifests.append(m)
        for b, fs in m["buckets"].items():
            for e in fs:
                if e["path"] not in seen_paths:
                    seen_paths.add(e["path"])
                    n_files += 1
                    if not fsio.exists(fsio.join(root, e["path"])):
                        bad("missing_file", version=m["version"],
                            bucket=int(b), path=e["path"])
                if str(e["schema_id"]) not in m.get("schemas", {}):
                    bad("unknown_schema_era", version=m["version"],
                        path=e["path"], schema_id=e["schema_id"])
                # deletion-vector sidecars are part of the file's readable
                # state: a missing sidecar dir crashes reads (or, repaired
                # naively, resurrects deleted rows)
                dvp = e.get("dv", {}).get("path")
                if dvp and dvp not in seen_dv:
                    seen_dv.add(dvp)
                    if not fsio.isdir(fsio.join(root, dvp)):
                        bad("missing_dv_sidecar", version=m["version"],
                            path=e["path"], dv=dvp)

    # 4. footer agreement on the manifests refs actually serve
    if verify_footers:
        head_versions = {ver for ver in refs.values()
                         if fsio.exists(table._manifest_path(ver))}
        checked: set[str] = set()
        for ver in sorted(head_versions):
            m = table.manifest(ver)
            entries = [
                e for fs in m["buckets"].values() for e in fs
                if e["path"] not in checked
                and e.get("n_rows") is not None
                and fsio.exists(fsio.join(root, e["path"]))
            ]
            checked.update(e["path"] for e in entries)
            pairs = [(i, os.path.join(root, e["path"]))
                     for i, e in enumerate(entries)]
            for i, n, lo, hi, _tlo, _thi, _live, _cs in table._footer_scan(pairs):
                e = entries[i]
                if n != e["n_rows"]:
                    bad("row_count_drift", version=ver, path=e["path"],
                        manifest_rows=e["n_rows"], footer_rows=n)
                elif (e.get("lsn_min") is not None
                      and (lo != e["lsn_min"] or hi != e["lsn_max"])):
                    bad("lsn_range_drift", version=ver, path=e["path"],
                        manifest=(e["lsn_min"], e["lsn_max"]),
                        footer=(lo, hi))

    # 4b. DV count agreement on the manifests refs actually serve: the
    # sidecar's per-file position counts must match each entry's recorded
    # n_deleted (a truncated/wrong-file sidecar silently under- or
    # over-deletes). Sidecars are tiny (16 bytes/position).
    if verify_footers:
        import pyarrow.parquet as _pq

        head_versions = {ver for ver in refs.values()
                         if fsio.exists(table._manifest_path(ver))}
        dv_counts_cache: dict[str, dict] = {}
        for ver in sorted(head_versions):
            m = table.manifest(ver)
            for fs in m["buckets"].values():
                for e in fs:
                    dv = e.get("dv")
                    if not dv:
                        continue
                    dvp = dv["path"]
                    if dvp not in dv_counts_cache:
                        counts: dict[str, int] = {}
                        dv_dir = fsio.join(root, dvp)
                        if fsio.isdir(dv_dir):
                            for full, _sz in fsio.walk_files(dv_dir):
                                if not full.endswith(".parquet"):
                                    continue
                                with fsio.open_input(full) as f:
                                    t = _pq.read_table(f, columns=["path"])
                                for k in t.column("path").to_pylist():
                                    counts[k] = counts.get(k, 0) + 1
                        dv_counts_cache[dvp] = counts
                    got = dv_counts_cache[dvp].get(_dv_key(e["path"]), 0)
                    if got != dv["n_deleted"]:
                        bad("dv_count_drift", version=ver, path=e["path"],
                            manifest_deleted=dv["n_deleted"], sidecar_rows=got)

    # 5. ledger sanity (duplicate batch ids only: the ledger's LSN ranges
    # count SOURCE events, which legitimately exceed what the files show —
    # a batch's max-LSN event may be an LWW loser or a reclaimed tombstone —
    # so a ledger-vs-footer LSN comparison cannot distinguish loss from LWW)
    rows = lineage_rows(table)
    seen_batches: set[int] = set()
    for r in rows:
        if r["batch_id"] in seen_batches:
            bad("duplicate_ledger_batch", batch_id=r["batch_id"])
        seen_batches.add(r["batch_id"])

    return {
        "ok": not v,
        "violations": v,
        "n_manifests": len(manifests),
        "n_files": n_files,
        "n_refs": len(refs),
        "n_ledger_batches": len(rows),
    }
