"""schemaprocessor — semconv schema-version attribute translation.

Reference (processor/schemaprocessor, 2,089 LoC): downloads a schema-URL
family file and applies per-version transformations (attribute renames at
resource/log/span scope) to move telemetry from its declared version to a
configured target. The heavy plumbing is the schema-file fetch/parse; the
data-plane operation is a rename map applied per version step.

Batch re-expression: translations are declared inline (no network in this
engine) as ``{version: {old_name: new_name}}`` and compiled to one column
rename pass per version step, applied in semver order from the record's
declared version (a column or a constant) up to the target. Column-level
renames are metadata-only in Arrow — zero-copy.
"""

from __future__ import annotations

import pyarrow as pa
from ray.data import Dataset


def _semver_key(v: str) -> tuple[int, ...]:
    return tuple(int(p) for p in v.split("."))


def schema_transform(translations: dict[str, dict[str, str]],
                     from_version: str, to_version: str):
    """map_batches fn renaming attribute columns through every version step
    in (from_version, to_version]. Unknown columns pass through; chained
    renames compose across steps (1.0: a->b, 1.1: b->c applies a->c)."""
    steps = sorted((v for v in translations
                    if _semver_key(from_version) < _semver_key(v)
                    <= _semver_key(to_version)), key=_semver_key)

    def fn(batch: pa.Table) -> pa.Table:
        names = list(batch.column_names)
        renamed = [False] * len(names)
        for v in steps:
            ren = translations[v]
            for i, n in enumerate(names):
                if n in ren:
                    names[i] = ren[n]
                    renamed[i] = True
        if names == list(batch.column_names):
            return batch
        # collisions: renamed values WIN over stale pre-existing columns
        # (the reference schemaprocessor overwrites); if several sources
        # rename to the same target, the LAST one wins — the schema must
        # never carry duplicate names
        drop: set[int] = set()
        last_renamed: dict[str, int] = {}
        for i, (n, r) in enumerate(zip(names, renamed)):
            if names.count(n) <= 1:
                continue
            if not r:
                drop.add(i)
            else:
                if n in last_renamed:
                    drop.add(last_renamed[n])
                last_renamed[n] = i
        if drop:
            keep = [i for i in range(len(names)) if i not in drop]
            batch = batch.select(keep)
            names = [names[i] for i in keep]
        return batch.rename_columns(names)

    return fn


def schema_processor(ds: Dataset, *, translations: dict[str, dict[str, str]],
                     from_version: str, to_version: str) -> Dataset:
    """Apply the version-ordered rename chain to a Dataset (zero-copy —
    Arrow renames touch only schema metadata)."""
    return ds.map_batches(
        schema_transform(translations, from_version, to_version),
        batch_format="pyarrow", batch_size=None)
