"""Broadcast-lookup enrichment (the k8sattributes / resourcedetection pattern).

Reference semantics (studied, not ported):
  - k8sattributesprocessor holds an in-memory pod index and stamps resource
    attributes per record via pod_association rules
    (processor/k8sattributesprocessor/processor.go:30-44, internal/kube/client.go).
  - resourcedetectionprocessor computes constant attributes once at startup
    (processor/resourcedetectionprocessor/internal/resourcedetection.go).
  - geoipprocessor opens a lookup DB once and queries per record.

Ray-Data-first mapping: the small side is broadcast once via ``ray.put`` on
the driver; each actor in the pool fetches it ONCE in ``__init__`` (zero-copy
from the local object store — on a multi-node cluster, one transfer per node),
then every batch is a vectorized ``pc.index_in`` + ``take`` dictionary lookup.
The reference's informer refresh = re-broadcast + new actor pool epoch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray


class BroadcastLookupEnricher:
    """Actor-pool stage: for each (input_column -> {key: value}) mapping spec,
    append an output column by dictionary lookup.

    spec: list of (input_col, output_col, mapping_ref_or_dict, default).
    Pass ``ray.put(mapping)`` object refs for large maps so each node fetches
    the table once; plain dicts are fine for tiny maps.

    Use as:
        ds.map_batches(BroadcastLookupEnricher, fn_constructor_args=(spec,),
                       batch_format="pyarrow", concurrency=(2, 8))
    """

    def __init__(self, spec):
        self.compiled = []
        for in_col, out_col, mapping, default in spec:
            if isinstance(mapping, ray.ObjectRef):
                mapping = ray.get(mapping)  # once per actor, not per batch
            keys = pa.array(list(mapping.keys()), pa.string())
            vals = pa.array(list(mapping.values()), pa.string())
            self.compiled.append((in_col, out_col, keys, vals, default))

    def __call__(self, batch: pa.Table) -> pa.Table:
        for in_col, out_col, keys, vals, default in self.compiled:
            col = batch[in_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            idx = pc.index_in(col, value_set=keys)
            out = pc.take(vals, idx)
            if default is not None:
                out = pc.coalesce(out, pa.scalar(default, pa.string()))
            batch = batch.append_column(out_col, out)
        return batch


# Flagship enrichment tables (BASELINE.json north_star: role->service,
# tool->resource mappings mirroring the resource/k8sattributes processors).
ROLE_TO_SERVICE = {
    "user": "client",
    "assistant": "agent",
    "system": "orchestrator",
    "tool": "runtime",
}
TOOL_TO_RESOURCE = {
    "bash": "compute",
    "search": "retrieval",
    "browser": "web",
    "editor": "workspace",
    "": "none",
}


def flagship_enrich_spec(use_object_store: bool = True):
    """Build the flagship spec; broadcasts via ray.put when a Ray session is up."""
    role_map, tool_map = ROLE_TO_SERVICE, TOOL_TO_RESOURCE
    if use_object_store and ray.is_initialized():
        role_map, tool_map = ray.put(role_map), ray.put(tool_map)
    return [
        ("role", "service", role_map, "unknown"),
        ("tool", "resource", tool_map, "none"),
    ]


def spec_state_bytes(spec) -> int:
    """Rough in-line size of a spec's lookup state (ObjectRefs count as big —
    they were put in the object store precisely because they are)."""
    total = 0
    for _, _, mapping, _ in spec:
        if isinstance(mapping, ray.ObjectRef):
            return 1 << 30
        total += sum(len(str(k)) + len(str(v)) for k, v in mapping.items())
    return total


def enrich_stage(ds, spec, *, concurrency=None,
                 task_threshold_bytes: int = 1 << 20):
    """Plan the enrichment stage: small lookup state ships in the task
    closure (full task parallelism, no pool cap — fusion with neighboring
    task stages keeps one seamless pipeline); big state (the real
    k8sattributes/geoip case) becomes an actor pool that fetches the
    broadcast once per actor.
    """
    if spec_state_bytes(spec) <= task_threshold_bytes:
        enricher = BroadcastLookupEnricher(spec)  # compiled once, tiny
        return ds.map_batches(enricher, batch_format="pyarrow",
                              batch_size=None)
    # big state: broadcast once, fetch per actor in __init__
    spec = [(i, o, ray.put(m) if not isinstance(m, ray.ObjectRef)
             and ray.is_initialized() else m, d) for i, o, m, d in spec]
    return ds.map_batches(
        BroadcastLookupEnricher, fn_constructor_args=(spec,),
        batch_format="pyarrow", batch_size=None,
        concurrency=concurrency or (2, 8))
