"""Config-driven pipeline builder: the collector's YAML surface re-expressed.

The reference wires pipelines from YAML: receivers declare a stanza
``operators:`` list dispatched on ``type:`` (operator.Register registry,
pkg/stanza/operator/registry.go:7-40), processors carry OTTL statements
({context, conditions, statements} — transformprocessor/.../config.go:38-48),
and routingconnector carries a route table (config.go:83-105).

Our equivalent: a plain dict (load it from YAML/JSON if you like) with the
same shapes, compiled to a Ray Data pipeline:

    PIPELINE = {
      "operators": [                       # stanza operator list
        {"type": "regex_parser", "regex": "...", "parse_from": "text"},
        {"type": "severity_parser", "parse_from": "attr_level"},
        {"type": "add", "field": "env", "value": "prod",
         "if": 'attr_level == "error"'},
        {"type": "filter", "expr": 'severity_number < 5'},
      ],
      "routes": [                          # routingconnector table
        {"condition": 'severity_number >= 17', "sink": "errors"},
        {"condition": 'role == "user"', "sink": "user-turns"},
      ],
      "default_sink": "default",
    }
    ds = build_from_config(ds, PIPELINE)

Conditions use a tiny expression grammar (the expr-lang/OTTL-condition
niche): comparisons on columns, string/number/bool literals, and/or/not,
parentheses, ``matches`` (RE2 partial), ``in [..]``, ``contains``.
"""

from __future__ import annotations

import re

from ray.data import Dataset

from ..expr import Expr, col, lit
from ..stages import transform as tr
from ..stages.parse import (
    csv_parser,
    json_parser,
    jsonarray_parser,
    keyvalue_parser,
    regex_parser,
    scope_parser,
    severity_parser,
    syslog_rfc3164_parser,
    time_parser,
    trace_parser,
)
from ..stages.route import Route, RouteTable

# ---------------------------------------------------------------------------
# condition expression parser
# ---------------------------------------------------------------------------

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<lparen>\() | (?P<rparen>\)) |
      (?P<op><=|>=|==|!=|<|>) |
      (?P<kw>\band\b|\bor\b|\bnot\b|\bmatches\b|\bcontains\b|\bin\b) |
      (?P<str>"(?:[^"\\]|\\.)*") |
      (?P<num>-?\d+\.\d+|-?\d+) |
      (?P<bool>\btrue\b|\bfalse\b|\bnil\b) |
      (?P<lbrack>\[) | (?P<rbrack>\]) | (?P<comma>,) |
      (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
    )""", re.VERBOSE)


def _tokenize(s: str):
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise ValueError(f"bad condition near: {s[pos:]!r}")
            break
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
        pos = m.end()
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive descent: or -> and -> not -> cmp -> primary."""

    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def eat(self, kind=None, val=None):
        k, v = self.toks[self.i]
        if (kind and k != kind) or (val and v != val):
            raise ValueError(f"expected {kind or val}, got {k}:{v!r}")
        self.i += 1
        return v

    def parse(self) -> Expr:
        e = self.p_or()
        self.eat("eof")
        return e

    def p_or(self) -> Expr:
        e = self.p_and()
        while self.peek() == ("kw", "or"):
            self.eat()
            e = e | self.p_and()
        return e

    def p_and(self) -> Expr:
        e = self.p_not()
        while self.peek() == ("kw", "and"):
            self.eat()
            e = e & self.p_not()
        return e

    def p_not(self) -> Expr:
        if self.peek() == ("kw", "not"):
            self.eat()
            return ~self.p_not()
        return self.p_cmp()

    def p_cmp(self) -> Expr:
        left = self.p_primary()
        k, v = self.peek()
        if k == "op":
            self.eat()
            right = self.p_primary()
            return {"==": left == right, "!=": left != right,
                    "<": left < right, "<=": left <= right,
                    ">": left > right, ">=": left >= right}[v]
        if (k, v) == ("kw", "matches"):
            self.eat()
            return left.match_re(self._lit_str())
        if (k, v) == ("kw", "contains"):
            self.eat()
            return left.contains(self._lit_str())
        if (k, v) == ("kw", "in"):
            self.eat()
            self.eat("lbrack")
            vals = []
            while self.peek()[0] != "rbrack":
                vals.append(self._lit_value())
                if self.peek()[0] == "comma":
                    self.eat()
            self.eat("rbrack")
            return left.isin(vals)
        return left

    def p_primary(self) -> Expr:
        k, v = self.peek()
        if k == "lparen":
            self.eat()
            e = self.p_or()
            self.eat("rparen")
            return e
        if k == "ident":
            self.eat()
            return col(v)
        return lit(self._lit_value())

    def _lit_value(self):
        k, v = self.peek()
        if k == "str":
            self.eat()
            # the tokenizer accepts any backslash escape; decode the two
            # the stanza expr language produces (\" and \\) — leaving
            # \\ doubled made 'C:\\logs' never match real paths
            return v[1:-1].replace("\\\\", "\x00") \
                .replace('\\"', '"').replace("\x00", "\\")
        if k == "num":
            self.eat()
            return float(v) if "." in v else int(v)
        if k == "bool":
            self.eat()
            return {"true": True, "false": False, "nil": None}[v]
        raise ValueError(f"expected literal, got {k}:{v!r}")

    def _lit_str(self) -> str:
        k, v = self.peek()
        if k != "str":
            raise ValueError("expected string literal")
        self.eat()
        return v[1:-1].replace("\\\\", "\x00") \
            .replace('\\"', '"').replace("\x00", "\\")


def parse_condition(s: str) -> Expr:
    """Compile a condition string to an Expr (Arrow-mask evaluable)."""
    return _Parser(_tokenize(s)).parse()


# ---------------------------------------------------------------------------
# operator registry (the stanza type: dispatch)
# ---------------------------------------------------------------------------

def _gate(cfg):
    return parse_condition(cfg["if"]) if "if" in cfg else None


def _op_regex_parser(cfg):
    return regex_parser(cfg["regex"], parse_from=cfg.get("parse_from", "text"),
                        prefix=cfg.get("prefix", ""),
                        on_error=cfg.get("on_error", "send"))


def _op_keyvalue(cfg):
    return keyvalue_parser(parse_from=cfg.get("parse_from", "text"),
                           delimiter=cfg.get("delimiter", "="),
                           keys=cfg.get("keys"),
                           prefix=cfg.get("prefix", "attr_"))


def _op_json(cfg):
    return json_parser(parse_from=cfg.get("parse_from", "text"),
                       fields=cfg.get("fields"),
                       prefix=cfg.get("prefix", "attr_"))


def _op_csv(cfg):
    return csv_parser(parse_from=cfg.get("parse_from", "text"),
                      header=cfg.get("header"),
                      delimiter=cfg.get("delimiter", ","),
                      prefix=cfg.get("prefix", ""))


def _op_severity(cfg):
    return severity_parser(cfg["parse_from"], mapping=cfg.get("mapping"))


def _op_time(cfg):
    return time_parser(cfg["parse_from"], cfg["layout"],
                       layout_type=cfg.get("layout_type", "strptime"),
                       out=cfg.get("out", "ts_parsed"))


def _op_add(cfg):
    expr = parse_condition(cfg["expr"]) if "expr" in cfg else None
    return tr.add(cfg["field"], value=cfg.get("value"), expr=expr,
                  where=_gate(cfg))


def _op_schema(cfg):
    from ..stages.schema import schema_transform
    return schema_transform(cfg["translations"], cfg["from_version"],
                            cfg["to_version"])


def _op_filter(cfg):
    return tr.filter_drop(parse_condition(cfg["expr"]),
                          drop_ratio=cfg.get("drop_ratio", 1.0),
                          seed_col=cfg.get("seed_col"))


OPERATOR_REGISTRY = {
    "regex_parser": _op_regex_parser,
    "key_value_parser": _op_keyvalue,
    "json_parser": _op_json,
    "csv_parser": _op_csv,
    "severity_parser": _op_severity,
    "time_parser": _op_time,
    "add": _op_add,
    "remove": lambda cfg: tr.remove(cfg["fields"]),
    "move": lambda cfg: tr.move(cfg["from"], cfg["to"], where=_gate(cfg)),
    "copy": lambda cfg: tr.copy(cfg["from"], cfg["to"], where=_gate(cfg)),
    "retain": lambda cfg: tr.retain(cfg["fields"]),
    "unquote": lambda cfg: tr.unquote(cfg["field"], where=_gate(cfg)),
    "regex_replace": lambda cfg: tr.regex_replace(
        cfg["field"], cfg["regex"], cfg["replace_with"], where=_gate(cfg)),
    "filter": _op_filter,
    "noop": lambda cfg: tr.noop(),
    "json_array_parser": lambda cfg: jsonarray_parser(
        parse_from=cfg.get("parse_from", "text"),
        header=(cfg.get("header", "").split(",")
                if isinstance(cfg.get("header"), str) else cfg.get("header")),
        prefix=cfg.get("prefix", "")),
    "trace_parser": lambda cfg: trace_parser(
        trace_from=cfg.get("trace_id", {}).get("parse_from", "trace_id"),
        span_from=cfg.get("span_id", {}).get("parse_from", "span_id"),
        flags_from=cfg.get("trace_flags", {}).get("parse_from",
                                                  "trace_flags")),
    "scope_name_parser": lambda cfg: scope_parser(
        cfg["parse_from"], out=cfg.get("out", "scope_name")),
    "syslog_parser_rfc3164": lambda cfg: syslog_rfc3164_parser(
        parse_from=cfg.get("parse_from", "text"),
        prefix=cfg.get("prefix", "syslog_")),
    "schema_transform": lambda cfg: _op_schema(cfg),
    "redact": lambda cfg: tr.redact(cfg["fields"], cfg["blocked_values"],
                                    mask_text=cfg.get("mask", "****")),
    "sampler": lambda cfg: tr.probabilistic_sampler(
        cfg["percent"], cfg["key_col"]),
}


def register_operator(type_name: str, builder) -> None:
    """operator.Register equivalent (registry.go:7-40)."""
    OPERATOR_REGISTRY[type_name] = builder


def compile_operators(op_cfgs: list[dict]):
    """Operator list -> one fused batch fn (the linear stanza DAG chain)."""
    fns = []
    for cfg in op_cfgs:
        typ = cfg["type"]
        if typ not in OPERATOR_REGISTRY:
            raise ValueError(f"unknown operator type: {typ!r}")
        fns.append(OPERATOR_REGISTRY[typ](cfg))
    return tr.chain(*fns)


def compile_routes(cfg: dict) -> RouteTable:
    routes = [Route(r["sink"], parse_condition(r["condition"]),
                    attributes=r.get("attributes"))
              for r in cfg.get("routes", [])]
    return RouteTable(routes, default=cfg.get("default_sink", "default"))


def build_from_config(ds: Dataset, cfg: dict) -> Dataset:
    """Compile {operators, transform, routes, default_sink} into
    map_batches stages. ``transform`` is a list of transformprocessor
    statement groups ({context, conditions, statements, error_mode} with
    REAL OTTL statement text — transformprocessor/internal/common/
    config.go:38-48), executed between the operator chain and routing,
    mirroring a collector pipeline's processor position."""
    if cfg.get("operators"):
        ds = ds.map_batches(compile_operators(cfg["operators"]),
                            batch_format="pyarrow", batch_size=None)
    if cfg.get("transform"):
        from .statements import transform_processor
        ds = ds.map_batches(transform_processor(cfg["transform"]),
                            batch_format="pyarrow", batch_size=None)
    if cfg.get("filter_matchers"):
        # filterprocessor declarative include/exclude
        # (filterconfig/config.go:22-30 MatchConfig)
        from ..stages.filtermatch import (filter_logs,
                                          match_properties_from_dict)
        fm = cfg["filter_matchers"]
        cols = {k: fm[k] for k in ("body_col", "severity_text_col",
                                   "severity_number_col") if k in fm}
        ds = filter_logs(
            ds,
            include=(match_properties_from_dict(fm["include"])
                     if fm.get("include") else None),
            exclude=(match_properties_from_dict(fm["exclude"])
                     if fm.get("exclude") else None),
            **cols)
    if cfg.get("tail_sampling"):
        # tailsamplingprocessor policy list (config.go:50-70), batch
        # analogue keyed on the trace/conversation column
        from ..stages.tailsample import tail_sample
        tsc = cfg["tail_sampling"]
        ds = tail_sample(ds, tsc["policies"],
                         key_col=tsc.get("trace_key", "conv_id"),
                         ts_col=tsc.get("ts_col", "ts"))
    if cfg.get("routes"):
        ds = ds.map_batches(compile_routes(cfg), batch_format="pyarrow",
                            batch_size=None)
    return ds


def load_config(path: str) -> dict:
    """Load a pipeline config from YAML or JSON — the collector's
    config-file surface (service.pipelines shape, flattened to
    {operators, transform, routes, default_sink})."""
    import json

    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        import yaml
        return yaml.safe_load(text)
    return json.loads(text)


def build_from_config_file(ds: Dataset, path: str) -> Dataset:
    return build_from_config(ds, load_config(path))
