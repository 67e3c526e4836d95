"""Multi-table atomic transactions over a LakeCatalog.

The reference publishes a *Dataset* — several tables plus an
``index.json`` — as one unit: tables are written first, the index is
synced last, and the dataset's checksum fence makes the whole publish
idempotent (/root/reference/lib/catalog/owid/catalog/datasets.py:48-124,
/root/reference/etl/publish.py:99-176). A step therefore never exposes
half a dataset. This module is that guarantee re-expressed for the
lake: a ``CatalogTransaction`` groups merges against any number of
tables and makes them durable **all-or-nothing**, with a commit
protocol that survives a crash at any point.

Protocol (per-table manifests are already atomic; the txn adds a
catalog-level commit point on top):

1. **Prepare.** Every merge issued through ``txn.table(name)`` runs the
   normal merge machinery but commits *prepared* manifests: the
   ``v{N}.json`` is created (exclusive-create — the version number is
   claimed, so concurrent non-txn writers lose cleanly with
   ``CommitConflictError`` instead of interleaving) and stamped with
   the txn id; the table's ``CURRENT`` is NOT flipped, so readers see
   nothing.
2. **Commit point.** ``txn.commit()`` exclusive-creates ONE record
   ``<catalog>/_txns/<id>.json`` listing every ``(table, version)``
   pair. This single file create is the atomic commit.
3. **Roll forward.** Each table's ``CURRENT`` is then flipped
   (forward-only). A crash between 2 and 3 is healed by
   ``LakeCatalog.recover()``: the commit record exists, so recovery
   finishes the flips.

A crash before step 2 leaves claimed-but-invisible manifests; they
block the version number, which is exactly a write lock held by a dead
writer. ``recover(grace_sec)`` rolls those back (deletes the prepared
manifests and the data dirs only they reference) once they are older
than the grace window, unblocking writers. Grace must exceed the
longest prepare-to-commit latency of any live transaction, the same
contract ``expire_versions`` already applies to in-flight data dirs.

Visibility: the commit *point* is the record; the per-table flips land
immediately after (metadata-only, microseconds). Readers wanting
cross-table repeatable reads use ``catalog.snapshot()`` as always —
the txn guarantee is about durability atomicity (no crash can leave
half the tables published), matching the reference's sync-index-last
contract, not about blocking concurrent readers.

``repair()`` (on LakeTable) also heals the single-table analogue that
needs no txn log: a plain writer that crashed between manifest create
and CURRENT flip left a complete, durable version invisible — and the
claimed number wedges every future writer into CommitConflictError.
Roll-forward is correct there by construction (flipping CURRENT is
precisely the crashed writer's next instruction).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from etl_spark.lake.table import (
    CommitConflictError,
    LakeCatalog,
    LakeTable,
    _atomic_create,
    _flip_forward,
)


class TransactionStateError(RuntimeError):
    """Operation illegal for the transaction's current state."""


def _manifest_data_dirs(m: dict) -> set[str]:
    """Every data/delta directory a manifest references."""
    dirs: set[str] = set()
    for ent in m["buckets"].values():
        dirs.add(os.path.dirname(ent["path"]))
    for d in m.get("deltas", []):
        for ent in d["buckets"].values():
            dirs.add(os.path.dirname(ent["path"]))
    return dirs


# CURRENT flips use table.py's _flip_forward: forward-only AND
# serialized under the CURRENT.lock, so a recovery pass racing a live
# writer can never regress CURRENT (ADVICE r4).


class _TxnTable(LakeTable):
    """A LakeTable handle whose commits PREPARE instead of publish.

    All merge machinery (COW/MOR resolve, schema evolution, epoch
    fences, derived columns) is inherited unchanged; only the two
    version-visibility points differ:

    - ``current_version`` includes versions this txn has prepared on
      this table, so a second merge inside the txn chains onto the
      first (its manifest file is on disk, just not yet CURRENT);
    - ``_commit`` stamps the manifest with the txn id and skips the
      CURRENT flip — the version number is still claimed by the
      exclusive manifest create, which is what locks out concurrent
      writers for the duration of the transaction.
    """

    def __init__(self, spark, root: str, txn: "CatalogTransaction"):
        super().__init__(spark, root)
        self._txn = txn

    def current_version(self) -> int:
        base = super().current_version()
        prepared = self._txn._last_prepared.get(self.root)
        return base if prepared is None else max(base, prepared)

    def _commit(self, new_manifest: dict) -> int:
        self._txn._require_open()
        v = new_manifest["version"]
        stamped = {**new_manifest, "txn": self._txn.txn_id}
        _atomic_create(
            os.path.join(self._meta_dir, f"v{v}.json"), json.dumps(stamped)
        )
        self._txn._record_prepare(self.root, v, stamped)
        return v


class CatalogTransaction:
    """All-or-nothing publish across any number of catalog tables."""

    def __init__(self, catalog: LakeCatalog, txn_id: str | None = None):
        self.catalog = catalog
        self.txn_id = txn_id or uuid.uuid4().hex
        self.state = "open"
        # root -> [versions prepared, in order]; and the manifests
        self._prepared: dict[str, list[int]] = {}
        self._manifests: dict[tuple[str, int], dict] = {}
        self._last_prepared: dict[str, int] = {}

    # -- lifecycle ---------------------------------------------------

    def _require_open(self) -> None:
        if self.state != "open":
            raise TransactionStateError(f"transaction is {self.state}")

    def _record_prepare(self, root: str, version: int, manifest: dict) -> None:
        self._prepared.setdefault(root, []).append(version)
        self._manifests[(root, version)] = manifest
        self._last_prepared[root] = version

    def table(self, name: str) -> _TxnTable:
        """A write handle for ``name`` whose merges join this txn."""
        self._require_open()
        return _TxnTable(
            self.catalog.spark, os.path.join(self.catalog.root, name), self
        )

    def create_table(self, name: str, schema, key_cols, **kw) -> _TxnTable:
        """Create-and-write inside the txn. Creation itself is visible
        immediately (an empty v0 is content-free — the reference also
        mkdirs the dataset folder before writing tables); every merge
        through the returned handle is transactional."""
        self._require_open()
        LakeTable.create(
            self.catalog.spark,
            os.path.join(self.catalog.root, name),
            schema,
            key_cols,
            **kw,
        )
        return self.table(name)

    # -- commit / abort ----------------------------------------------

    @property
    def _txn_dir(self) -> str:
        return os.path.join(self.catalog.root, "_txns")

    def commit(self) -> dict:
        """Publish every prepared version atomically.

        The exclusive create of the txn record is the commit point;
        the per-table CURRENT flips after it are roll-forward work
        that recovery finishes if this process dies mid-loop.

        A transaction that outlived ``recover``'s grace window may
        already have been rolled back (its prepared manifests deleted,
        their data dirs reclaimed). Committing anyway would point
        CURRENT at a deleted manifest and break every read, so two
        fences close that hole: (1) every prepared manifest is
        re-verified on disk immediately before the commit point, and
        (2) recovery writes an ABORT tombstone at the commit record's
        own path before rolling back, making this create — the atomic
        arbiter — lose cleanly if recovery got there first.
        """
        self._require_open()
        os.makedirs(self._txn_dir, exist_ok=True)
        missing = [
            (root, vs[-1])
            for root, vs in self._prepared.items()
            if not os.path.exists(os.path.join(root, "_meta", f"v{vs[-1]}.json"))
        ]
        if missing:
            self.state = "aborted"
            raise TransactionStateError(
                f"prepared manifests vanished (rolled back by recovery — the "
                f"txn outlived the grace window): {missing}"
            )
        tables = {
            os.path.relpath(root, self.catalog.root): vs[-1]
            for root, vs in self._prepared.items()
        }
        record = {
            "txn": self.txn_id,
            "tables": tables,
            "committed_at": time.time(),
        }
        try:
            _atomic_create(
                os.path.join(self._txn_dir, f"{self.txn_id}.json"),
                json.dumps(record),
            )
        except CommitConflictError:
            # recovery's abort tombstone (or an impossible duplicate
            # commit) won the record path: this txn is dead
            self.state = "aborted"
            raise TransactionStateError(
                f"transaction {self.txn_id} was rolled back by recovery "
                "before commit (prepare-to-commit exceeded the grace window)"
            ) from None
        self.state = "committed"
        for root, vs in self._prepared.items():
            _flip_forward(os.path.join(root, "_meta"), vs[-1])
        return record

    def abort(self) -> None:
        """Discard every prepared version: delete the claimed manifests
        (unblocking the version numbers for other writers) and the
        data dirs only those manifests reference. Safe because nothing
        ever flipped CURRENT — no reader or consumer can hold a
        reference to these versions."""
        self._require_open()
        self.state = "aborted"
        for root, vs in self._prepared.items():
            base = LakeTable(self.catalog.spark, root)
            keep: set[str] = set()
            # dirs shared with any non-txn version must survive (carried-
            # forward bucket pointers reference the base's dirs)
            meta = os.path.join(root, "_meta")
            for fn in os.listdir(meta):
                if not (fn.startswith("v") and fn.endswith(".json")):
                    continue
                v = int(fn[1:-5])
                if v in vs:
                    continue
                try:
                    keep |= _manifest_data_dirs(base.manifest(v))
                except FileNotFoundError:
                    continue
            drop: set[str] = set()
            for v in vs:
                drop |= _manifest_data_dirs(self._manifests[(root, v)])
                try:
                    os.remove(os.path.join(meta, f"v{v}.json"))
                except FileNotFoundError:
                    pass
            for d in drop - keep:
                shutil.rmtree(d, ignore_errors=True)

    def __enter__(self) -> "CatalogTransaction":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if self.state != "open":
            return
        if exc_type is None:
            self.commit()
        else:
            self.abort()


# -- recovery ----------------------------------------------------------


_ABORT_TOMBSTONE_TTL_SEC = 86_400.0


def recover(catalog: LakeCatalog, grace_sec: float = 3600.0) -> list[dict]:
    """Heal the catalog after crashes at any point of the txn protocol.

    - **Roll forward** every committed txn record's pending CURRENT
      flips (crash between commit point and flip loop), and every
      plain non-txn manifest sitting above CURRENT (crash between a
      single-table commit's manifest create and its flip).
    - **Roll back** txn-prepared manifests whose txn never committed,
      once the txn's NEWEST prepared manifest is older than
      ``grace_sec`` (younger ones may belong to a live transaction
      about to commit — the same in-flight-window reasoning as
      expire_versions' orphan grace, and the default now matches its
      3600s rather than undercutting it 12×).

    Rollback treats one transaction's prepared versions as a UNIT and
    only rolls back complete suffixes of the above-CURRENT chain,
    deleting from the highest version down — so a txn that prepared
    v5 minutes before v6 can never lose v5 while v6 survives, and no
    gap is ever left for the sequential scan to wedge on.

    Before deleting anything, recovery exclusive-creates an ABORT
    tombstone at the txn's own commit-record path. ``commit()`` races
    for that same path, so a still-live transaction that commits
    after rollback began loses atomically (TransactionStateError)
    instead of pointing CURRENT at a deleted manifest. Tombstones are
    GC'd after a day — long past any plausible prepare-to-commit span,
    and commit()'s manifest-existence pre-check remains as the second
    fence forever.

    Returns one row per action: {table, version, action} with action
    in {rolled_forward, rolled_back}.
    """
    actions: list[dict] = []
    txn_dir = os.path.join(catalog.root, "_txns")
    committed: dict[str, dict] = {}
    aborted: dict[str, dict] = {}
    if os.path.isdir(txn_dir):
        for fn in os.listdir(txn_dir):
            if fn.endswith(".json"):
                with open(os.path.join(txn_dir, fn)) as f:
                    rec = json.load(f)
                (aborted if rec.get("aborted") else committed)[fn[:-5]] = rec
    now = time.time()

    def _abort_tombstone(txn_id: str) -> bool:
        """Claim the commit-record path for rollback. Returns False if
        the txn committed in the window since our scan (roll forward
        instead); True if the tombstone is ours or another recovery
        pass already aborted the txn."""
        if txn_id in aborted:
            return True
        os.makedirs(txn_dir, exist_ok=True)
        rec = {"txn": txn_id, "aborted": True, "aborted_at": now}
        try:
            _atomic_create(
                os.path.join(txn_dir, f"{txn_id}.json"), json.dumps(rec)
            )
        except CommitConflictError:
            with open(os.path.join(txn_dir, f"{txn_id}.json")) as f:
                existing = json.load(f)
            if not existing.get("aborted"):
                committed[txn_id] = existing  # committed under us
                return False
        aborted[txn_id] = rec
        return True

    for name in catalog.list_tables():
        t = catalog.table(name)
        cur = t.current_version()
        # contiguous chain of manifests above CURRENT
        chain: list[tuple[int, dict]] = []
        v = cur + 1
        while True:
            path = os.path.join(t._meta_dir, f"v{v}.json")
            if not os.path.exists(path):
                break
            with open(path) as f:
                chain.append((v, json.load(f)))
            v += 1
        # roll forward the committed/plain prefix
        i = 0
        while i < len(chain):
            v, m = chain[i]
            txn_id = m.get("txn")
            if txn_id is not None and txn_id not in committed:
                break
            _flip_forward(t._meta_dir, v)
            actions.append({"table": name, "version": v, "action": "rolled_forward"})
            i += 1
        suffix = chain[i:]
        if not suffix:
            continue
        # group the uncommitted suffix into contiguous same-txn runs
        groups: list[list[tuple[int, dict]]] = []
        for v, m in suffix:
            if groups and groups[-1][-1][1].get("txn") == m.get("txn"):
                groups[-1].append((v, m))
            else:
                groups.append([(v, m)])
        # from the top: a group is droppable when its txn was already
        # aborted, or its NEWEST manifest is past grace; stop at the
        # first keeper (dropping below it would leave a gap)
        j = len(groups)
        while j > 0:
            g = groups[j - 1]
            txn_id = g[-1][1].get("txn")
            if txn_id in committed or txn_id is None:
                break  # committed/plain above an uncommitted run: keep all below
            newest_age = now - float(g[-1][1].get("committed_at", 0))
            if txn_id not in aborted and newest_age < grace_sec:
                break  # possibly live; leave the claim in place
            j -= 1
        drop = [vm for g in groups[j:] for vm in g]
        if not drop:
            continue
        # claim tombstones before touching any file; a txn that
        # committed under us cancels the whole rollback this pass
        if not all(
            _abort_tombstone(tid)
            for tid in {m.get("txn") for _v, m in drop if m.get("txn")}
        ):
            continue
        drop_vs = {v for v, _m in drop}
        drop_dirs: set[str] = set()
        for _v, m in drop:
            drop_dirs |= _manifest_data_dirs(m)
        # dirs shared with any surviving version must stay
        keep: set[str] = set()
        for fn in os.listdir(t._meta_dir):
            if fn.startswith("v") and fn.endswith(".json"):
                try:
                    sv = int(fn[1:-5])
                except ValueError:
                    continue
                if sv in drop_vs:
                    continue
                try:
                    keep |= _manifest_data_dirs(t.manifest(sv))
                except (FileNotFoundError, ValueError):
                    continue
        # delete manifests highest-first: a crash mid-loop leaves a
        # shorter contiguous chain, never a gap
        for v, _m in sorted(drop, reverse=True):
            try:
                os.remove(os.path.join(t._meta_dir, f"v{v}.json"))
            except FileNotFoundError:
                pass
            actions.append({"table": name, "version": v, "action": "rolled_back"})
        for d in drop_dirs - keep:
            shutil.rmtree(d, ignore_errors=True)
    # GC txn records whose every flip is complete: once no table's
    # CURRENT is behind the recorded version, the record carries no
    # pending roll-forward work and recovery never needs it again
    # (dropped tables count as complete). Safe because CURRENT is
    # monotone — a version at or below CURRENT can never return to
    # the above-CURRENT state that makes recovery consult the record.
    # Keeps _txns O(in-flight), not O(commit history).
    for txn_id, rec in committed.items():
        done = True
        for rel, v in rec.get("tables", {}).items():
            meta = os.path.join(catalog.root, rel, "_meta", "CURRENT")
            try:
                with open(meta) as f:
                    cur = int(f.read().strip())
            except FileNotFoundError:
                continue
            if cur < int(v):
                done = False
                break
        if done:
            os.remove(os.path.join(txn_dir, f"{txn_id}.json"))
            actions.append({"table": None, "version": None, "action": "gc_txn_record",
                            "txn": txn_id})
    # GC abort tombstones after a day: their rollback work completed in
    # the pass that wrote them, and their only residual job — failing a
    # zombie commit() — is also covered by commit()'s manifest check
    for txn_id, rec in aborted.items():
        if now - float(rec.get("aborted_at", now)) > _ABORT_TOMBSTONE_TTL_SEC:
            try:
                os.remove(os.path.join(txn_dir, f"{txn_id}.json"))
            except FileNotFoundError:
                continue
            actions.append({"table": None, "version": None,
                            "action": "gc_abort_tombstone", "txn": txn_id})
    return actions


def repair(table: LakeTable) -> int:
    """Single-table roll-forward for a standalone table (no catalog txn
    log): flip CURRENT over any complete non-txn manifests a crashed
    writer left above it. Returns the resulting CURRENT. Txn-stamped
    manifests are left alone — only ``recover`` (which can consult the
    txn log) may decide their fate."""
    v = table.current_version() + 1
    while True:
        path = os.path.join(table._meta_dir, f"v{v}.json")
        if not os.path.exists(path):
            break
        with open(path) as f:
            m = json.load(f)
        if m.get("txn") is not None:
            break
        _flip_forward(table._meta_dir, v)
        v += 1
    return table.current_version()
