"""Routing fan-out (routingconnector re-expressed as a vectorized stage).

Reference semantics (studied, not ported):
  - connector/routingconnector/logs.go:62-110: the route table is walked
    SEQUENTIALLY; each route MOVES matching records out of the batch
    (first-match-wins); anything left after the last route goes to
    default_pipelines (logs.go:103-104).
  - connector/routingconnector/config.go:83-105: route = {condition, pipelines}.
  - stanza router (transformer/router/transformer.go:46-90) has identical
    first-match semantics per entry.

Ray-Data-first mapping: because each row is routed independently, the
sequential move-semantics collapse to "sink = first route whose condition
matches" — one vectorized pass per batch computing all route masks and
combining them in table order (the Arrow equivalent of np.select). The
result is a ``sink`` column; fan-out is then either a single partitioned
write (write_parquet(partition_cols=['sink'])) or per-sink filtered writes —
no data is rewritten per route, so the whole fan-out is one pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..expr import Expr, col


class Route:
    """One route: condition -> sink, with optional attributes stamped onto
    matching rows (stanza router's per-route Attributer —
    transformer/router/config.go attributes field)."""

    def __init__(self, sink: str, condition: Expr,
                 attributes: dict[str, str] | None = None):
        self.sink = sink
        self.condition = condition
        self.attributes = attributes or {}


class RouteTable:
    """First-match-wins route table with a default sink."""

    def __init__(self, routes: list[Route], default: str = "default",
                 sink_col: str = "sink"):
        self.routes = routes
        self.default = default
        self.sink_col = sink_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # walk in table order; later routes only claim still-unrouted rows
        n = batch.num_rows
        out = pa.nulls(n, pa.string())
        unclaimed = pa.array([True] * n, pa.bool_())
        attr_masks: list[tuple[pa.Array, dict[str, str]]] = []
        for route in self.routes:
            m = route.condition.mask(batch)
            take = pc.and_(m, unclaimed)
            out = pc.if_else(take, pa.scalar(route.sink), out)
            if route.attributes:
                attr_masks.append((take, route.attributes))
            unclaimed = pc.and_(unclaimed, pc.invert(take))
        out = pc.fill_null(out, self.default)
        # per-route attached attributes: masked constant columns
        attr_cols: dict[str, pa.Array] = {}
        for take, attrs in attr_masks:
            for k, v in attrs.items():
                cur = attr_cols.get(k, pa.nulls(n, pa.string()))
                attr_cols[k] = pc.if_else(take, pa.scalar(v), cur)
        for k, arr in attr_cols.items():
            if k in batch.column_names:
                old = batch[k]
                if isinstance(old, pa.ChunkedArray):
                    old = old.combine_chunks()
                if not (pa.types.is_string(old.type)
                        or pa.types.is_large_string(old.type)
                        or pa.types.is_null(old.type)):
                    # stamping string attributes into a non-string column
                    # would silently re-type every unstamped row's value
                    # ('7' for 7) — surface the config conflict instead
                    raise TypeError(
                        f"route attribute {k!r} collides with existing "
                        f"column of type {old.type} — rename the attribute "
                        "or cast the column first")
                arr = pc.coalesce(arr, pc.cast(old, pa.string()))
                batch = batch.set_column(batch.column_names.index(k), k, arr)
            else:
                batch = batch.append_column(k, arr)
        if self.sink_col in batch.column_names:
            return batch.set_column(batch.column_names.index(self.sink_col),
                                    self.sink_col, out)
        return batch.append_column(self.sink_col, out)

    @property
    def sinks(self) -> list[str]:
        return [r.sink for r in self.routes] + [self.default]


def flagship_route_table() -> RouteTable:
    """FIXTURES.md F3 route table over parsed transcript turns:
       1. severity_number >= 17            -> errors
       2. tool == 'bash' and role == 'assistant' -> tool-calls
       3. role == 'user'                   -> user-turns
       default                             -> default
    """
    return RouteTable([
        Route("errors", col("severity_number") >= 17),
        Route("tool-calls", (col("tool") == "bash") & (col("role") == "assistant")),
        Route("user-turns", col("role") == "user"),
    ], default="default")
