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
                       batch_format="pyarrow", concurrency=actor_pool_size())
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


def flagship_enrich_spec(use_object_store: bool = False):
    """Build the flagship spec. The lookup tables are a few dozen bytes,
    so the default ships them INLINE (task closure -> full fusion);
    ``use_object_store=True`` exercises the broadcast path (which
    enrich_stage treats as big state and runs on an actor pool)."""
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
    from .shuffle import actor_pool_size
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
        concurrency=concurrency or actor_pool_size(),
        # ctor args hold driver-owned object refs: an in-place restart
        # cannot outlive them (ray#53727), so let the pool replace dead
        # actors instead (and keep the known-noise warning out of stderr)
        max_restarts=0)


def range_enrich_stage(ds, ranges, key_col: str, out_col: str, *,
                       key_is_ip: bool = False, default=None,
                       concurrency=None,
                       task_threshold_bytes: int = 1 << 20):
    """Plan an interval-lookup stage with the same small/big state split as
    ``enrich_stage``: a few-entry range table ships compiled in the task
    closure (fuses with neighbors, no pool spin-up); a real geo DB
    (MBs of intervals) is broadcast once and fetched per actor."""
    from .shuffle import actor_pool_size

    approx = sum(16 + len(str(v)) for _, _, v in ranges)
    if approx <= task_threshold_bytes:
        enricher = RangeLookupEnricher(ranges, key_col, out_col,
                                       key_is_ip, default)
        return ds.map_batches(enricher, batch_format="pyarrow",
                              batch_size=None)
    ref = ray.put(ranges) if ray.is_initialized() else ranges
    return ds.map_batches(
        RangeLookupEnricher,
        fn_constructor_args=(ref, key_col, out_col, key_is_ip, default),
        batch_format="pyarrow", batch_size=None,
        concurrency=concurrency or actor_pool_size(), max_restarts=0)


class RangeLookupEnricher:
    """Actor-pool stage for interval lookups — the geoipprocessor pattern
    (maxmind db opened once per actor; per-record range query, SURVEY.md
    §2.6). State: sorted, non-overlapping [start, end] -> value intervals,
    broadcast once via ray.put and fetched in __init__; per batch the probe
    is one vectorized np.searchsorted.

    Works on any orderable key; ``ip_to_int`` vectorizes dotted-quad IPv4
    strings for the classic geo case.
    """

    def __init__(self, ranges_ref, key_col: str, out_col: str,
                 key_is_ip: bool = False, default=None):
        import numpy as np

        r = ray.get(ranges_ref) if isinstance(ranges_ref, ray.ObjectRef) \
            else ranges_ref
        starts, ends, values = zip(*sorted(r)) if r else ((), (), ())
        self.starts = np.asarray(starts, np.uint64)
        self.ends = np.asarray(ends, np.uint64)
        self.values = pa.array(values, pa.string())
        self.key_col, self.out_col = key_col, out_col
        self.key_is_ip, self.default = key_is_ip, default

    @staticmethod
    def ip_to_int(col: pa.Array):
        """Vectorized dotted-quad IPv4 -> uint32 (no per-row Python).
        Octets are validated <= 255 — a malformed address like 1.2.3.300
        must read as invalid (null/default), not alias to 1.2.4.44."""
        st = pc.extract_regex(
            col, r"^(?P<a>\d{1,3})\.(?P<b>\d{1,3})\.(?P<c>\d{1,3})\.(?P<d>\d{1,3})$")
        parts = [pc.cast(pc.struct_field(st, g), pa.uint64())
                 for g in ("a", "b", "c", "d")]
        ok = None
        for p in parts:
            le = pc.less_equal(p, pa.scalar(255, pa.uint64()))
            ok = le if ok is None else pc.and_(ok, le)
        out = pc.add(pc.add(pc.multiply(parts[0], pa.scalar(1 << 24, pa.uint64())),
                            pc.multiply(parts[1], pa.scalar(1 << 16, pa.uint64()))),
                     pc.add(pc.multiply(parts[2], pa.scalar(1 << 8, pa.uint64())),
                            parts[3]))
        return pc.if_else(pc.fill_null(ok, False), out,
                          pa.nulls(len(out), pa.uint64()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        col = batch[self.key_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self.key_is_ip:
            keys = self.ip_to_int(col)
        elif pa.types.is_unsigned_integer(col.type):
            # unsigned keys can't be negative, and routing them through
            # int64 would crash on values >= 2^63
            keys = pc.cast(col, pa.uint64())
        else:
            # out-of-range integer keys (negative sentinels etc.) map to
            # the default instead of crashing the cast
            as64 = pc.cast(col, pa.int64())
            nonneg = pc.fill_null(pc.greater_equal(as64, 0), False)
            keys = pc.cast(pc.if_else(nonneg, as64,
                                      pa.nulls(len(as64), pa.int64())),
                           pa.uint64())
        valid = pc.is_valid(keys)
        k = pc.fill_null(keys, 0).to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = np.searchsorted(self.starts, k, side="right") - 1
        in_range = (idx >= 0) & (k <= self.ends[np.clip(idx, 0, None)]) \
            if len(self.starts) else np.zeros(len(k), bool)
        take_idx = pa.array(np.where(in_range, np.clip(idx, 0, None), -1),
                            pa.int64())
        out = pc.take(self.values, pc.if_else(
            pc.and_(pa.array(in_range), valid), take_idx, pa.scalar(None, pa.int64())))
        if self.default is not None:
            out = pc.coalesce(out, pa.scalar(self.default, pa.string()))
        return batch.append_column(self.out_col, out)


def resource_detection(detectors: list[str] | None = None,
                       override: dict[str, str] | None = None,
                       prefix: str = ""):
    """resourcedetectionprocessor: detect the environment ONCE at plan-build
    time on the driver (the reference probes once at collector startup —
    internal/resourcedetection.go) and stamp the detected attributes as
    constant columns via a map_batches closure. Supported detectors:
    'system' (host.name, os.type), 'env' (OTEL_RESOURCE_ATTRIBUTES
    k=v,k=v), plus explicit ``override`` attributes (highest precedence).
    """
    import os
    import platform

    attrs: dict[str, str] = {}
    for d in (detectors or []):
        if d == "system":
            attrs["host.name"] = platform.node()
            attrs["os.type"] = platform.system().lower()
        elif d == "env":
            raw = os.environ.get("OTEL_RESOURCE_ATTRIBUTES", "")
            for pair in filter(None, raw.split(",")):
                if "=" in pair:
                    k, v = pair.split("=", 1)
                    attrs[k.strip()] = v.strip()
        else:
            raise ValueError(f"unknown detector {d!r}")
    attrs.update(override or {})

    def fn(batch: pa.Table) -> pa.Table:
        for k, v in attrs.items():
            name = prefix + k
            if name not in batch.column_names:
                batch = batch.append_column(
                    name, pa.array([v] * batch.num_rows, pa.string()))
        return batch

    return fn
