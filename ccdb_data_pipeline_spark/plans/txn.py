"""Multi-table atomic transactions over WAP branches (catalog-level 2PC).

A CDC pipeline rarely maintains one table: the transcript table, its IVM
aggregate views, and derived marts must move together or an analytics read
joins post-batch facts against pre-batch aggregates. Single-table commits
are already atomic (manifest slot + HEAD CAS, plans/lake.py:_commit); this
module adds the cross-table step the reference performs implicitly with one
alias swap over one index (index_ccdb.py:45-71), generalized to N tables:

1. **stage**  — each table's batch is written on a WAP branch
   (``create_branch``); main readers see nothing.
2. **intent** — a single exclusive-create intent record (the transaction's
   commit point) lists every (table root, branch, target version, expected
   main version).
3. **publish** — each branch is fast-forwarded under the table's ref lock.
   A crash anywhere after (2) is ROLLED FORWARD by :func:`recover` — the
   intent is the redo log; publishes are idempotent against it.
4. **seal**   — the intent is atomically renamed into the committed log,
   which doubles as a *consistent version-set catalog*:
   :meth:`TransactionLog.consistent_versions` pins every table at the
   versions of the last sealed transaction, giving readers cross-table
   snapshot isolation via the existing time-travel ``read(version)``.

Before the intent record exists, :meth:`Transaction.abort` drops the
branches and nothing happened. This is the local-FS analog of a catalog
transaction (Nessie/LakeFS-style); the Iceberg backend would delegate to
catalog multi-table commit where available.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from .lake import SnapshotParquetTable, _atomic_write_exclusive


class TransactionAbortedError(RuntimeError):
    pass


class TransactionLog:
    """Directory of intent (``txn-*.intent.json``) and sealed
    (``txn-*.committed.json``) transaction records."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)

    # ------------------------------------------------------------ recovery

    def pending(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self.log_dir) if f.endswith(".intent.json")
        )

    def recover(self, spark) -> list[str]:
        """Roll forward every unfinished transaction. Idempotent; safe to run
        at every engine start (the streaming driver calls nothing implicitly —
        recovery is an explicit maintenance step, like compaction)."""
        done = []
        for fn in self.pending():
            path = os.path.join(self.log_dir, fn)
            with open(path) as f:
                intent = json.load(f)
            self._publish_all(spark, intent)
            self._seal(path, intent)
            done.append(intent["txn_id"])
        return done

    # ------------------------------------------------------------ internals

    def _publish_all(self, spark, intent: dict) -> None:
        for t in intent["tables"]:
            main = SnapshotParquetTable(spark, t["root"])
            cur = main.current_version()
            if cur == t["target_version"]:
                continue  # this table already published before the crash
            if t["branch"] in main.branches():
                main.publish_branch(t["branch"], default_audits=t["audits"])
                continue
            # branch ref gone but main isn't at the target: either the swap
            # happened and main has since moved on (target is an ancestor),
            # or the single-publisher assumption was violated
            idx = main._snapshot_index()
            target_m = main.manifest(t["target_version"])
            if main._is_ancestor(target_m["snapshot_id"], main.manifest(), idx):
                continue
            raise TransactionAbortedError(
                f"cannot roll forward {t['root']}: main@v{cur} diverged from "
                f"txn target v{t['target_version']}"
            )

    def _seal(self, intent_path: str, intent: dict) -> None:
        intent["sealed_at"] = time.time()
        sealed = intent_path.replace(".intent.json", ".committed.json")
        with open(intent_path, "w") as f:
            json.dump(intent, f, indent=1)
        os.replace(intent_path, sealed)  # atomic: intent disappears with seal

    # ------------------------------------------------------------ retention

    CHECKPOINT = "txn-checkpoint.json"

    def checkpoint(self) -> dict | None:
        """The folded-history record left by ``expire``, or None."""
        p = os.path.join(self.log_dir, self.CHECKPOINT)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def expire(self, keep_last: int = 100) -> dict:
        """Bound the sealed-record count: fold every sealed transaction but
        the newest ``keep_last`` into ONE checkpoint record, then delete the
        folded files. At one transaction per micro-batch a 10^10-event
        replay seals millions of records; without this, every
        ``consistent_versions`` / replica-sync call reads them ALL — the
        same unbounded-metadata problem snapshot manifests have, with the
        same fix (``expire_snapshots``' log-level analog).

        The checkpoint carries the folded interval's final per-table
        versions and its max seal time, so ``consistent_versions`` is
        UNCHANGED by an expiry (asserted by tests). What is lost is
        per-cut granularity INSIDE the folded interval: a replica whose
        cursor predates the horizon can no longer replay those exact cut
        boundaries — it converges through the surviving records' (wider)
        change-feed windows instead, falling back to the snapshot-then-tail
        floor bootstrap when table history expired too. Crash-safe:
        the checkpoint is atomically replaced BEFORE any folded file is
        deleted, and re-folding a leftover record re-applies the same
        versions (idempotent), so a crash between the two steps only
        leaves garbage a re-run reclaims. In-flight intents are never
        touched."""
        base = self.checkpoint() or {
            "kind": "checkpoint", "versions": {}, "sealed_at": 0.0,
            "folded": 0, "txn_ids_tail": [],
        }
        horizon = tuple(base["horizon"]) if base.get("horizon") else None
        recs, leftovers = [], []
        for fn in os.listdir(self.log_dir):
            if not fn.endswith(".committed.json"):
                continue
            with open(os.path.join(self.log_dir, fn)) as f:
                rec = json.load(f)
            at = rec.get("sealed_at", 0.0)
            if horizon and (at, fn) <= horizon:
                # folded-but-undeleted leftover from a crash mid-expire:
                # already accounted for in the checkpoint — deleting it
                # again without re-folding keeps the folded counter and
                # txn_ids_tail truthful
                leftovers.append(fn)
                continue
            recs.append((at, fn, rec))
        for fn in leftovers:
            os.remove(os.path.join(self.log_dir, fn))
        recs.sort(key=lambda r: (r[0], r[1]))
        fold = recs[:-keep_last] if keep_last > 0 else recs
        if not fold:
            return {"folded": 0, "kept": len(recs),
                    **({"reclaimed": len(leftovers)} if leftovers else {})}
        for _at, _fn, rec in fold:
            for t in rec["tables"]:
                base["versions"][t["root"]] = t["target_version"]
            base["sealed_at"] = max(base["sealed_at"], rec.get("sealed_at", 0.0))
            base["folded"] += 1
        # the last few folded ids, for operators tracing "where did my txn
        # record go" — bounded, not a full index
        base["txn_ids_tail"] = (
            base.get("txn_ids_tail", []) + [r[2]["txn_id"] for r in fold]
        )[-16:]
        # fold horizon (seal time + filename of the LAST folded record):
        # lets consistent_versions skip a folded-but-undeleted leftover
        # after a crash between the checkpoint replace and the deletes —
        # re-applying such a record could regress a table to a pre-fold
        # version the checkpoint already superseded
        base["horizon"] = [fold[-1][0], fold[-1][1]]
        tmp = os.path.join(self.log_dir, self.CHECKPOINT + ".tmp")
        with open(tmp, "w") as f:
            json.dump(base, f, indent=1)
        os.replace(tmp, os.path.join(self.log_dir, self.CHECKPOINT))
        for _at, fn, _rec in fold:
            os.remove(os.path.join(self.log_dir, fn))
        return {"folded": len(fold), "kept": len(recs) - len(fold),
                **({"reclaimed": len(leftovers)} if leftovers else {})}

    # ------------------------------------------------------------ catalog

    def consistent_versions(self) -> dict[str, int]:
        """table root -> version of the last SEALED transaction touching it.
        Readers pin with ``SnapshotParquetTable(...).read(version)`` to get a
        cross-table-consistent view regardless of in-flight commits. History
        folded by ``expire`` contributes through the checkpoint record, so
        the answer is identical before and after an expiry."""
        out: dict[str, int] = {}
        cp = self.checkpoint()
        if cp:
            out.update({r: int(v) for r, v in cp["versions"].items()})
        recs = []
        for fn in sorted(
            f for f in os.listdir(self.log_dir) if f.endswith(".committed.json")
        ):
            with open(os.path.join(self.log_dir, fn)) as f:
                rec = json.load(f)
            recs.append((rec.get("sealed_at", 0.0), fn, rec))
        # SEAL order, not filename order: txn ids are random hex, so the
        # lexicographically-last file can be a chronologically-earlier
        # transaction — replaying in filename order could pin table A at an
        # old txn's version while table B carries a newer one, a version
        # set that never coexisted (exactly the torn read this catalog
        # exists to prevent)
        recs.sort(key=lambda r: (r[0], r[1]))
        horizon = tuple(cp["horizon"]) if cp and cp.get("horizon") else None
        for at, fn, rec in recs:  # ascending seal order; later seals win
            if horizon and (at, fn) <= horizon:
                continue  # folded-but-undeleted leftover (crash mid-expire)
            for t in rec["tables"]:
                out[t["root"]] = t["target_version"]
        return out

    def begin(self) -> "Transaction":
        return Transaction(self)


class Transaction:
    """One multi-table commit. Usage::

        txn = TransactionLog(log).begin()
        b1 = txn.stage(facts)        # WAP branch handles
        b2 = txn.stage(aggregates)
        b1.merge(batch, batch_id); b2.merge(rollup, batch_id)
        txn.commit()                 # all-or-nothing (roll-forward on crash)
    """

    def __init__(self, log: TransactionLog):
        self.log = log
        self.txn_id = uuid.uuid4().hex[:12]
        self._staged: list[tuple[SnapshotParquetTable, SnapshotParquetTable]] = []
        self._state = "open"

    def stage(self, table: SnapshotParquetTable) -> SnapshotParquetTable:
        if self._state != "open":
            raise TransactionAbortedError(f"transaction is {self._state}")
        if table.ref != "main":
            raise ValueError("stage from the main handle")
        branch = table.create_branch(f"txn-{self.txn_id}")
        self._staged.append((table, branch))
        return branch

    def commit(self, audits: bool = True) -> dict[str, int]:
        """Write the intent (the commit point), publish every branch, seal.
        Raises before the intent exists -> nothing published (branches
        dropped); raises after -> :meth:`TransactionLog.recover` completes it.
        """
        if self._state != "open":
            raise TransactionAbortedError(f"transaction is {self._state}")
        # pre-flight BEFORE the intent: audits and fast-forward checks must
        # fail the transaction while it can still abort cleanly — once the
        # intent exists, publishing is unconditional (it's the redo log)
        try:
            for main, branch in self._staged:
                main._manifest = None
                main_m, branch_m = main.manifest(), branch.manifest()
                if main_m["version"] == branch_m["version"]:
                    continue
                idx = main._snapshot_index()
                if not main._is_ancestor(main_m["snapshot_id"], branch_m, idx):
                    raise TransactionAbortedError(
                        f"{main.root}: main moved past txn branch {branch.ref}"
                    )
                if audits:
                    main._run_default_audits(branch_m, main_m, idx)
        except Exception:
            self.abort()
            raise
        intent = {
            "txn_id": self.txn_id,
            "created_at": time.time(),
            "tables": [
                {
                    "root": main.root,
                    "branch": branch.ref,
                    "target_version": branch.current_version(),
                    "expected_main": main.current_version(),
                    "audits": False,  # audited pre-intent; redo never re-audits
                }
                for main, branch in self._staged
            ],
        }
        intent_path = os.path.join(self.log.log_dir, f"txn-{self.txn_id}.intent.json")
        try:
            _atomic_write_exclusive(intent_path, json.dumps(intent, indent=1))
        except Exception:
            self.abort()
            raise
        self._state = "committed"
        for main, branch in self._staged:
            main.publish_branch(branch.ref, default_audits=False)
        self.log._seal(intent_path, intent)
        return {t["root"]: t["target_version"] for t in intent["tables"]}

    def abort(self) -> None:
        """Drop staged branches; mains were never touched."""
        for main, branch in self._staged:
            if branch.ref in main.branches():
                main.drop_branch(branch.ref)
        self._state = "aborted"
