"""Connector-family operators beyond routing/count/sum (SURVEY.md §2.7-2.8)
plus the remaining stanza parsers (uri, container) and otlpjson.

- otlpjson_connector: re-parse OTLP-JSON-ish payload columns back into typed
  columns (connector/otlpjsonconnector/logs.go:43-64) — polars' Rust JSON
  path kernel, zero-copy from Arrow.
- uri_parser: stanza parser/uri (config.go:33) — URL -> component columns.
- container_parser: stanza parser/container (config.go:47-51) — docker /
  containerd(cri) log lines + path-derived metadata.
- groupbyattrs: re-key records under a promoted resource identity
  (processor/groupbyattrsprocessor/processor.go:63-99): in flat-table form
  the ResourceLogs grouping is a derived resource-id column (canonical
  over the promoted attrs), usable as a partition key.
- roundrobin: connector/roundrobinconnector -> ds.split(n).
- failover: connector/failoverconnector -> sink wrapper that falls back to
  the next sink callable on error.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from ..functions.ottl import URL_RE
from .aggregate import canonical_identity


def otlpjson_parser(parse_from: str, fields: dict[str, tuple[str, str]],
                    prefix: str = ""):
    """Extract JSONPath fields from a JSON string column into typed columns.

    fields: {out_col: (json_path, type)} with type in {int, double, string}.
    Uses polars' vectorized json_path_match (Rust) — no Python row loop.
    """
    import polars as pl

    types = {"int": pa.int64(), "double": pa.float64(), "string": pa.string()}

    def fn(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch[parse_from])
        if isinstance(s, pl.DataFrame):
            s = s.to_series()
        for out, (path, typ) in fields.items():
            vals = s.str.json_path_match(path).to_arrow()
            arr = pc.cast(pc.cast(vals, pa.string()), types[typ])
            batch = batch.append_column(prefix + out, arr)
        return batch
    return fn


def uri_parser(parse_from: str, prefix: str = "uri_"):
    """stanza uri parser: URL string -> scheme/host/port/path/query columns."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        st = pc.extract_regex(col, URL_RE)
        for name in ("scheme", "host", "port", "path", "query"):
            batch = batch.append_column(prefix + name, pc.struct_field(st, name))
        return batch
    return fn


# docker json-file lines and containerd (cri) lines
_CRI_RE = (r"^(?P<time>\S+) (?P<stream>stdout|stderr) (?P<logtag>[PF]) "
           r"(?P<log>.*)$")
_PATH_RE = (r"/pods/(?P<namespace>[^_]+)_(?P<pod_name>[^_]+)_(?P<pod_uid>[^/]+)"
            r"/(?P<container_name>[^/]+)/(?P<restart_count>\d+)\.log$")


def container_parser(parse_from: str = "text", path_col: str | None = None):
    """stanza container parser: CRI-format line split + (optionally) k8s
    metadata derived from the log file path (parser/container/config.go)."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        st = pc.extract_regex(col, _CRI_RE)
        for name in ("time", "stream", "logtag", "log"):
            batch = batch.append_column("cri_" + name, pc.struct_field(st, name))
        if path_col is not None:
            p = batch[path_col]
            if isinstance(p, pa.ChunkedArray):
                p = p.combine_chunks()
            meta = pc.extract_regex(p, _PATH_RE)
            for name in ("namespace", "pod_name", "pod_uid", "container_name",
                         "restart_count"):
                batch = batch.append_column("k8s_" + name,
                                            pc.struct_field(meta, name))
        return batch
    return fn


def groupbyattrs(keys: list[str], out_col: str = "resource_id"):
    """Derive the promoted-resource identity column: records sharing the
    same values of ``keys`` belong to one Resource (the flat-table form of
    the groupbyattrs re-association; also the natural partition key)."""
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, canonical_identity(batch, keys))
    return fn


def roundrobin(ds: Dataset, n: int) -> list[Dataset]:
    """roundrobinconnector: distribute the stream across n pipelines.
    equal=False: equal=True may DROP records to even the splits, and a
    connector must deliver every record to some pipeline."""
    return ds.split(n, equal=False)


def failover_sink(*sinks):
    """failoverconnector: call sinks in priority order per batch; first
    success wins. Each sink: fn(batch) -> batch (writer stages)."""
    def fn(batch: pa.Table) -> pa.Table:
        last_err: Exception | None = None
        for s in sinks:
            try:
                return s(batch)
            except Exception as e:  # noqa: BLE001 - failover by design
                last_err = e
        raise last_err  # all sinks failed
    return fn


def exceptions_connector(ds: Dataset, *, condition, dims: list[str],
                         count_col: str = "exceptions_count",
                         mode: str = "metrics",
                         default_value: str = ""):
    """connector/exceptionsconnector: exception events -> metrics (counts
    keyed by service/type dimensions) or logs (the matching records,
    exception attributes attached upstream). ``condition`` is an Expr mask
    selecting exception rows (the batch form of the span-event
    'exception' filter in connector_logs.go / connector_metrics.go)."""
    from .aggregate import count_by

    if mode == "metrics":
        return count_by(ds, dims, condition=condition, count_col=count_col,
                        default_value=default_value)
    if mode == "logs":
        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(condition.mask(batch))
        return ds.map_batches(keep, batch_format="pyarrow", batch_size=None)
    raise ValueError(f"exceptions_connector: bad mode {mode!r}")


def signal_to_metrics(ds: Dataset, metric_defs: list[dict]) -> dict:
    """connector/signaltometricsconnector: generic OTTL-driven
    signal->metric. Each def: {name, type: count|sum|histogram,
    conditions: [OTTL condition strings, OR-ed — README 'Conditions'],
    attributes: [group-by cols], value: column (sum/histogram),
    bounds: [...] (histogram)}.

    Conditions use the REAL OTTL condition grammar via the statement
    engine's evaluator (pipelines/statements.py), so configs port over
    verbatim. Returns {name: Dataset} of metric tables.
    """
    from ..functions.ottl_parser import parse_ottl_condition
    from ..pipelines.statements import DEFAULT_COLMAP, _Ctx, _to_mask, \
        eval_expr
    from .aggregate import count_by, sum_by
    from .metrics import histogram_by

    out: dict = {}
    for d in metric_defs:
        conds = [parse_ottl_condition(c) for c in d.get("conditions", [])]

        def make_filter(conds=conds):
            def fn(batch: pa.Table) -> pa.Table:
                if not conds:
                    return batch
                ctx = _Ctx(batch, dict(DEFAULT_COLMAP))
                gate = None
                for c in conds:
                    m = _to_mask(eval_expr(c, ctx), ctx.n)
                    gate = m if gate is None else pc.or_kleene(gate, m)
                return batch.filter(pc.fill_null(gate, False))
            return fn

        filtered = ds.map_batches(make_filter(), batch_format="pyarrow",
                                  batch_size=None) if conds else ds
        typ = d.get("type", "count")
        # attributes are optional in the reference config: no attributes
        # = one unsegmented metric (grouped on nothing)
        attrs = d.get("attributes", [])
        if typ == "count":
            out[d["name"]] = count_by(filtered, attrs, count_col="value")
        elif typ == "sum":
            out[d["name"]] = sum_by(filtered, attrs, d["value"],
                                    sum_col="value")
        elif typ == "histogram":
            out[d["name"]] = histogram_by(filtered, attrs, d["value"],
                                          d["bounds"])
        else:
            raise ValueError(f"signal_to_metrics: bad type {typ!r}")
    return out
