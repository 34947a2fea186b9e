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


# --- OTel schema-file translation (semconv version hops) -------------------
#
# Reference: processor/schemaprocessor/internal/translation — parses an
# OTel schema file (file_format 1.0/1.1) and walks revisions between the
# record's version and the target. Per revision (translation.go
# ApplyScopeLogChanges / ApplyAllResourceChanges / ApplyScopeMetricChanges):
#   upgrade:  all.Apply -> <section>.Apply, versions ascending in
#             (from, to]
#   rollback: <section>.Rollback -> all.Rollback, versions descending in
#             (to, from]
# Sections used by the log/metric pipeline: all, resources, logs (attribute
# renames -> column renames in the flat model), metrics (rename_metrics ->
# value remap of the metric-name column; conditional rename_attributes ->
# value MOVE between columns gated on the metric name). span/span_event
# sections are span-scope and out of the log pipeline (SURVEY §2.6).


def parse_schema_file(text: str) -> dict:
    """YAML schema file -> {version: VersionDef dict} (the subset of
    ast.VersionDef the log/metric pipeline uses)."""
    import yaml

    doc = yaml.safe_load(text)
    return doc.get("versions") or {}


def _version_steps(versions: dict, from_version: str, to_version: str):
    """-> (ordered [(version, def)], rollback?) between the two versions:
    ascending (from, to] for upgrade, descending (to, from] for rollback."""
    lo, hi = _semver_key(from_version), _semver_key(to_version)
    if lo == hi:
        return [], False
    rollback = lo > hi
    if rollback:
        lo, hi = hi, lo
    steps = sorted((v for v in versions
                    if lo < _semver_key(v) <= hi), key=_semver_key,
                   reverse=rollback)
    return [(v, versions[v] or {}) for v in steps], rollback


def _section_attr_maps(d: dict | None) -> list[dict[str, str]]:
    out = []
    for ch in (d or {}).get("changes") or []:
        ren = ch.get("rename_attributes")
        if ren and ren.get("attribute_map"):
            out.append(dict(ren["attribute_map"]))
    return out


def semconv_log_transform(versions: dict, from_version: str,
                          to_version: str,
                          resource_cols: set[str] | None = None):
    """map_batches fn translating flat log-record columns between schema
    versions: 'all' renames apply to every column, 'logs' to record
    columns, 'resources' to resource columns (both scopes when
    ``resource_cols`` is None — the flat model carries resource attrs as
    plain columns). Rollback reverses each map and the application
    order, exactly like RevisionV1 Rollback."""
    steps, rollback = _version_steps(versions, from_version, to_version)
    plan: list[tuple[str, dict[str, str]]] = []  # (scope, old->new)
    for _, d in steps:
        per_rev: list[tuple[str, dict[str, str]]] = []
        for scope, section in (("all", "all"), ("resource", "resources"),
                               ("log", "logs")):
            for m in _section_attr_maps(d.get(section)):
                per_rev.append((scope, m))
        if rollback:
            per_rev = [(s, {v: k for k, v in m.items()})
                       for s, m in reversed(per_rev)]
        plan.extend(per_rev)

    def fn(batch: pa.Table) -> pa.Table:
        names = list(batch.column_names)
        renamed = [False] * len(names)
        for scope, m in plan:
            for i, n in enumerate(names):
                if n not in m:
                    continue
                if resource_cols is not None:
                    if scope == "resource" and n not in resource_cols:
                        continue
                    if scope == "log" and n in resource_cols:
                        continue
                names[i] = m[n]
                renamed[i] = True
        if names == list(batch.column_names):
            return batch
        # collision: renaming onto an existing column must not leave a
        # duplicate field (pcommon.Map rename overwrites) — the renamed
        # column WINS, the stale pre-existing one is dropped
        drop = {i for i, (n, r) in enumerate(zip(names, renamed))
                if not r and names.count(n) > 1}
        if drop:
            keep = [i for i in range(len(names)) if i not in drop]
            batch = batch.select(keep)
            names = [names[i] for i in keep]
        return batch.rename_columns(names)

    return fn


def semconv_metric_transform(versions: dict, from_version: str,
                             to_version: str, *,
                             name_col: str = "metric_name"):
    """map_batches fn for the metrics sections: rename_metrics remaps the
    metric-name column's VALUES; conditional rename_attributes moves
    values between columns only on rows whose (already-renamed) metric
    name is in apply_to_metrics. Change order within a revision follows
    the changes list (rename_metrics before a later conditional rename
    sees the NEW names, like changelist.Apply)."""
    import pyarrow.compute as pc

    steps, rollback = _version_steps(versions, from_version, to_version)
    # plan items: ("names", {old: new}) | ("cond", old, new, [metric names])
    plan: list[tuple] = []
    for _, d in steps:
        per_rev: list[tuple] = []
        for ch in (d.get("metrics") or {}).get("changes") or []:
            if ch.get("rename_metrics"):
                per_rev.append(("names", dict(ch["rename_metrics"])))
            ren = ch.get("rename_attributes")
            if ren and ren.get("attribute_map"):
                for old, new in ren["attribute_map"].items():
                    per_rev.append(("cond", old, new,
                                    list(ren.get("apply_to_metrics") or [])))
        if rollback:
            inv = []
            for item in reversed(per_rev):
                if item[0] == "names":
                    inv.append(("names", {v: k for k, v in item[1].items()}))
                else:
                    inv.append(("cond", item[2], item[1], item[3]))
            per_rev = inv
        plan.extend(per_rev)

    def fn(batch: pa.Table) -> pa.Table:
        for item in plan:
            name_arr = batch[name_col]
            if isinstance(name_arr, pa.ChunkedArray):
                name_arr = name_arr.combine_chunks()
            if item[0] == "names":
                m = item[1]
                # one lookup against the ORIGINAL names (Go reads each map
                # once per metric) — chained if_else would let
                # {'a':'b','b':'c'} rewrite an original 'a' to 'c'
                keys = pa.array(list(m.keys()), pa.string())
                vals = pa.array(list(m.values()), pa.string())
                idx = pc.index_in(pc.fill_null(name_arr, ""),
                                  value_set=keys)
                out = pc.if_else(pc.is_valid(idx), pc.take(vals, idx),
                                 name_arr)
                batch = batch.set_column(
                    batch.column_names.index(name_col), name_col, out)
            else:
                _, old, new, apply_to = item
                if old not in batch.column_names:
                    continue
                oldc = batch[old]
                if isinstance(oldc, pa.ChunkedArray):
                    oldc = oldc.combine_chunks()
                cond = pc.is_in(name_arr, value_set=pa.array(
                    apply_to, pa.string())) if apply_to else \
                    pa.array([True] * batch.num_rows, pa.bool_())
                cond = pc.fill_null(cond, False)
                newc = batch[new] if new in batch.column_names else \
                    pa.nulls(len(oldc), oldc.type)
                if isinstance(newc, pa.ChunkedArray):
                    newc = newc.combine_chunks()
                moved = pc.if_else(cond, oldc, newc)
                left = pc.if_else(cond, pa.nulls(len(oldc), oldc.type),
                                  oldc)
                if new in batch.column_names:
                    batch = batch.set_column(
                        batch.column_names.index(new), new, moved)
                else:
                    batch = batch.append_column(new, moved)
                batch = batch.set_column(
                    batch.column_names.index(old), old, left)
                # drop the source column only for UNCONDITIONAL renames —
                # a plan-time decision, so every block of the dataset
                # ends with the SAME schema (deciding per batch on
                # "fully vacated" made schemas depend on row content)
                if not apply_to:
                    batch = batch.drop_columns([old])
        return batch

    return fn
