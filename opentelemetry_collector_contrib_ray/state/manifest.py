"""Per-partition lineage + resumability manifests.

Reference semantics (studied, not ported): the collector checkpoints file
offsets + fingerprints through the storage extension
(pkg/stanza/adapter/receiver.go:42-45; fileconsumer design.md "Deduplication
of Files") so a restart resumes where it left off.

Batch equivalent (SURVEY.md §4): the unit of resume is an input partition
(hash range of conv_id / set of input fragments). Each completed partition
writes a ``_lineage/part-{id}.json`` manifest with its inputs, per-stage row
counts, per-sink counts and wall time; on resume, partitions whose manifest
exists are skipped and their outputs trusted (writes are deterministic-named
and atomic). This is exactly "resumable from checkpoint with per-partition
lineage + metrics" from the north rule.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass, field


@dataclass
class PartitionManifest:
    partition_id: str
    inputs: list[str]
    rows_in: int = 0
    rows_out: int = 0
    sink_counts: dict[str, int] = field(default_factory=dict)
    stage_rows: dict[str, int] = field(default_factory=dict)
    wall_time_sec: float = 0.0
    completed_at: float = 0.0


class ManifestStore:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, partition_id: str) -> str:
        return os.path.join(self.dir, f"part-{partition_id}.json")

    def is_complete(self, partition_id: str) -> bool:
        """A partition is complete only if its manifest PARSES — a bare
        existence check would let a truncated/garbled manifest mark its
        partition complete, which the resume path could never repair
        (load() treats corrupt as incomplete; so must this)."""
        return self.load(partition_id) is not None

    def pending(self, partition_ids: list[str]) -> list[str]:
        return [p for p in partition_ids if not self.is_complete(p)]

    def commit(self, manifest: PartitionManifest) -> None:
        """Atomic + durable: fsync the temp file before the rename and the
        directory after, so a power loss can't journal the rename without
        the data blocks (an empty part-*.json would otherwise mark an
        incomplete partition complete)."""
        manifest.completed_at = time.time()
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(asdict(manifest), f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(manifest.partition_id))
        dfd = os.open(self.dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def load(self, partition_id: str) -> PartitionManifest | None:
        """None for a missing OR unreadable manifest — a corrupt file must
        read as 'partition incomplete' (wipe + rebuild), not crash every
        subsequent resume."""
        try:
            with open(self._path(partition_id)) as f:
                return PartitionManifest(**json.load(f))
        except (FileNotFoundError, json.JSONDecodeError, TypeError):
            return None

    def all(self) -> list[PartitionManifest]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.startswith("part-") and name.endswith(".json"):
                m = self.load(name[len("part-"):-len(".json")])
                if m is not None:
                    out.append(m)
        return out
