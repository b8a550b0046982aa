"""Manifest-based atomic snapshot catalog (Iceberg-shaped, jar-free).

The reference controls sink visibility with ES ``refresh_interval: -1``
plus an explicit refresh on the final batch (mira/constants.py:25,
mira/elasticsearch.py:157-159) and guards idempotence with
delete-then-reload (mira/elasticsearch.py:211-225). Here both collapse
into atomic manifest commits: a build's output is invisible until the
manifest file is atomically renamed into place, and resume is
"skip partitions already in the manifest" (SURVEY §1.4, §7 step 0 note).

On a real cluster this module is swapped for an Iceberg catalog
(``df.writeTo(...).append()`` + snapshot commits); the sandbox has no
Iceberg jar, so the same semantics are provided over partitioned
parquet + a JSON manifest. Interface kept deliberately small.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionEntry:
    """Lineage + metrics for one committed build partition (SURVEY §7 step 5).

    Mirrors the reference's exactly-once accounting
    (mira/mira_loader.py:220-228) as data instead of asserts.
    """

    partition_id: int
    stage: str
    input_rows: int
    docs: int
    terms: int
    bytes: int
    wall_ms: int
    committed: bool = True


@dataclass
class Manifest:
    table: str
    partitions: list[dict] = field(default_factory=list)
    props: dict = field(default_factory=dict)
    version: int = 0


class ManifestCatalog:
    """Atomic-commit manifest over a directory of partitioned parquet."""

    MANIFEST = "_manifest.json"
    # Default snapshot retention: commit() keeps this many snapshot files
    # per table (tombstone-heavy workloads commit often; unbounded tiny
    # JSON files would accrete silently). Iceberg's equivalent knob is
    # history.expire.max-snapshot-age; here it's count-based.
    SNAPSHOT_RETENTION = 64

    def __init__(self, root: str, snapshot_retention: int | None = None):
        self.root = root
        self.snapshot_retention = (
            self.SNAPSHOT_RETENTION if snapshot_retention is None
            else snapshot_retention
        )
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table, self.MANIFEST)

    def table_dir(self, table: str) -> str:
        d = os.path.join(self.root, table)
        os.makedirs(d, exist_ok=True)
        return d

    def load(self, table: str, version: int | None = None) -> Manifest:
        """Current manifest, or — with ``version`` — that committed
        snapshot (Iceberg time travel over the lineage/metrics log).

        Snapshot files are written by :meth:`commit` alongside the
        current pointer; they capture the manifest (which partitions
        were committed, with what lineage + metrics) as of that commit.
        Data-file time travel follows only for append-only tables
        (generation appends); a rewrite (compaction, tiered merge)
        replaces data in place, after which old snapshots still document
        history but no longer resolve to readable data.
        """
        p = (
            self._path(table)
            if version is None
            else os.path.join(self.root, table, f"_manifest.v{version}.json")
        )
        if not os.path.exists(p):
            if version is not None:
                raise FileNotFoundError(
                    f"no snapshot v{version} for table {table!r} "
                    f"(expired or never committed); see snapshots()"
                )
            return Manifest(table=table)
        with open(p) as f:
            raw = json.load(f)
        return Manifest(**raw)

    def snapshots(self, table: str) -> list[dict]:
        """Snapshot log, oldest first: one row per retained commit
        (version, committed_at, n_partitions, total docs) — Iceberg's
        ``snapshots`` metadata table for this catalog."""
        d = os.path.join(self.root, table)
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            if not (name.startswith("_manifest.v") and name.endswith(".json")):
                continue
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
            out.append(
                {
                    "version": m["version"],
                    "committed_at": m["props"].get("committed_at"),
                    "n_partitions": len(m["partitions"]),
                    "docs": sum(e.get("docs", 0) for e in m["partitions"]),
                }
            )
        out.sort(key=lambda s: s["version"])
        return out

    def expire_snapshots(self, table: str, keep_last: int = 2) -> int:
        """Drop all but the newest ``keep_last`` snapshot files
        (Iceberg's expire_snapshots); the current pointer is never
        touched. Returns the number removed."""
        keep_last = max(0, keep_last)
        snaps = self.snapshots(table)
        removed = 0
        # max(0, ...): a negative cut would slice from the END and wrongly
        # expire everything but the newest while history is still short
        for s in snaps[: max(0, len(snaps) - keep_last)]:
            os.remove(
                os.path.join(self.root, table, f"_manifest.v{s['version']}.json")
            )
            removed += 1
        return removed

    def committed_partitions(self, table: str, stage: str | None = None) -> set[int]:
        m = self.load(table)
        return {
            e["partition_id"]
            for e in m.partitions
            if e.get("committed") and (stage is None or e["stage"] == stage)
        }

    def commit(
        self, table: str, new_entries: list[PartitionEntry], props: dict | None = None
    ) -> Manifest:
        """Append entries + bump version; atomic via tmpfile + rename."""
        m = self.load(table)
        m.partitions.extend(asdict(e) for e in new_entries)
        if props:
            m.props.update(props)
        m.version += 1
        m.props["committed_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        d = self.table_dir(table)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(asdict(m), f, indent=1)
        # snapshot file first (history), then the atomic current-pointer
        # replace — a crash between the two leaves an orphan snapshot that
        # the next commit's version bump supersedes harmlessly
        snap = os.path.join(d, f"_manifest.v{m.version}.json")
        fd2, tmp2 = tempfile.mkstemp(dir=d, suffix=".manifest.tmp")
        with os.fdopen(fd2, "w") as f:
            json.dump(asdict(m), f, indent=1)
        os.replace(tmp2, snap)
        os.replace(tmp, self._path(table))  # atomic on POSIX
        self.expire_snapshots(table, keep_last=self.snapshot_retention)
        return m

    def drop(self, table: str) -> None:
        """DROP TABLE IF EXISTS (reference K6: es.indices.delete, ignore 404)."""
        shutil.rmtree(os.path.join(self.root, table), ignore_errors=True)

    def clean_uncommitted(
        self, table: str, partition_col: str = "shard", id_divisor: int = 1
    ) -> None:
        """Remove partition dirs not recorded in the manifest.

        Replaces the reference's delete-then-reload guard
        (alhena_cli.py:47-50): a killed build leaves partial partition
        dirs; they are deleted before rebuild so resume is idempotent.

        ``id_divisor``: manifest key = dir value // divisor (the aligned
        build's sub-shards map back to their scan-split manifest entry).
        """
        committed = self.committed_partitions(table)
        d = self.table_dir(table)
        for name in os.listdir(d):
            if not name.startswith(f"{partition_col}="):
                continue
            pid = int(name.split("=", 1)[1]) // id_divisor
            if pid not in committed:
                shutil.rmtree(os.path.join(d, name), ignore_errors=True)


def index_stats(index_dir: str) -> dict:
    """ES ``_cat/indices`` / ``_stats`` analogue: one metadata dict per
    index — docs, generations, tombstones, on-disk bytes per table,
    snapshot counts. Pure filesystem + manifest metadata (no Spark
    session, no data read), so it is safe from any ops tooling."""
    import json as _json

    stats_path = os.path.join(index_dir, "stats.json")
    if not os.path.exists(stats_path):
        raise FileNotFoundError(f"{index_dir!r} is not a built index")
    with open(stats_path) as f:
        stats = _json.load(f)
    cat = ManifestCatalog(index_dir)
    out = {
        "index": index_dir,
        "n_docs": int(stats.get("n_docs", 0)),
        "max_doc_id": int(stats.get("max_doc_id", -1)),
        "avgdl": stats.get("avgdl"),
        "generations": int(stats.get("generations", 1)),
        "positions": bool(stats.get("positions", True)),
        "analysis": stats.get("analysis"),
        "routing_field": stats.get("routing_field"),
        "format": stats.get("format"),
        "applied_batches": list(stats.get("applied_batches", [])),
        "tables": {},
    }
    for name in sorted(os.listdir(index_dir)):
        d = os.path.join(index_dir, name)
        if not os.path.isdir(d):
            continue
        size = 0
        files = 0
        for root, _dirs, fnames in os.walk(d):
            for fn in fnames:
                if fn.endswith(".parquet"):
                    size += os.path.getsize(os.path.join(root, fn))
                    files += 1
        snaps = 0
        try:
            snaps = len(cat.snapshots(name))
        except Exception:
            pass
        out["tables"][name] = {
            "bytes": size, "parquet_files": files, "snapshots": snaps,
        }
    deletes = out["tables"].get("deletes")
    out["has_tombstones"] = bool(deletes and deletes["parquet_files"])
    return out
