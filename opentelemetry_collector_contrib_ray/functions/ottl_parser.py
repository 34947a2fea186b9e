"""Mini-parser for OTTL statements: `editor(args...) where <condition>`.

Reference grammar: pkg/ottl/grammar.go (participle lexer, 596 LoC) with
statement shape editor(args) + boolean `where` clause, paths like
``attributes["k"]`` / ``resource.attributes["k"]``, converter calls,
string/int/float/bool/nil/hex literals, list and map literals, and named
arguments (``resolveConflicts=true``). We implement the subset the e2e
conformance corpus (pkg/ottl/e2e/e2e_test.go) exercises — enough to replay
the reference's statement cases verbatim — as a small recursive-descent
parser producing a tuple-AST that ``pipelines/statements.py`` compiles to
vectorized Arrow column rewrites.

AST nodes (plain tuples):
  ("lit", value)                       literals incl. bytes from 0x...
  ("list", [expr, ...])
  ("map", [(key, expr), ...])
  ("path", [(name, [index_expr, ...]), ...])
  ("call", Name, [args], {kwargs})
  ("binop", op, left, right)           == != < <= > >= + - * /
  ("bool", op, [exprs])                and / or
  ("not", expr)
  ("editor", name, [args], {kwargs}, where_expr_or_None)
"""

from __future__ import annotations

import re

from .gostr import go_unquote

# pdata severity enum (pkg/stanza/entry/severity.go mirrors the same 25
# levels; OTTL exposes them as SEVERITY_NUMBER_* constants)
ENUMS: dict[str, int] = {"SEVERITY_NUMBER_UNSPECIFIED": 0,
                         # pmetric.AggregationTemporality (ottlmetric /
                         # ottldatapoint enum symbols)
                         "AGGREGATION_TEMPORALITY_UNSPECIFIED": 0,
                         "AGGREGATION_TEMPORALITY_DELTA": 1,
                         "AGGREGATION_TEMPORALITY_CUMULATIVE": 2,
                         # pmetric.MetricType (ottlmetric METRIC_DATA_TYPE_*)
                         "METRIC_DATA_TYPE_NONE": 0,
                         "METRIC_DATA_TYPE_GAUGE": 1,
                         "METRIC_DATA_TYPE_SUM": 2,
                         "METRIC_DATA_TYPE_HISTOGRAM": 3,
                         "METRIC_DATA_TYPE_EXPONENTIAL_HISTOGRAM": 4,
                         "METRIC_DATA_TYPE_SUMMARY": 5}
for _i, _name in enumerate(["TRACE", "DEBUG", "INFO", "WARN", "ERROR",
                            "FATAL"]):
    for _j in range(4):
        suffix = "" if _j == 0 else str(_j + 1)
        ENUMS[f"SEVERITY_NUMBER_{_name}{suffix}"] = 1 + _i * 4 + _j

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<hex>0x[0-9a-fA-F]+) |
      (?P<num>[-+]?\d*\.\d+(?:[eE][-+]?\d+)?|[-+]?\d+) |
      (?P<str>"(?:[^"\\]|\\.)*") |
      (?P<op>==|!=|<=|>=|<|>|\+|-|\*|/) |
      (?P<lparen>\() | (?P<rparen>\)) |
      (?P<lbrack>\[) | (?P<rbrack>\]) |
      (?P<lbrace>\{) | (?P<rbrace>\}) |
      (?P<comma>,) | (?P<dot>\.) | (?P<colon>:) | (?P<eq>=) |
      (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    )""", re.VERBOSE)

_KEYWORDS = {"where", "and", "or", "not", "nil", "true", "false"}

# grammar.go buildLexer: Uppercase = [A-Z][A-Z0-9_]* — a whole name in this
# shape (not continued by lowercase) is an enum symbol, not a path
_UPPER_RE = re.compile(r"[A-Z][A-Z0-9_]*\Z")

# grammar.go path field = ONE Lowercase token ([a-z][a-z0-9_]*): an
# uppercase letter anywhere in a path segment is a participle parse error
# ('SEVmax', 'observedTime'), never a valid field
_FIELD_RE = re.compile(r"[a-z][a-z0-9_]*\Z")


def _unescape(s: str) -> str:
    """Full Go strconv.Unquote decoding for a quoted String token —
    participle.Unquote("String") (pkg/ottl/parser.go:310) runs every
    string literal through strconv.Unquote, so \\a \\b \\f \\n \\r \\t
    \\v \\xNN \\uNNNN \\UNNNNNNNN and 3-digit octal all decode, and an
    invalid escape (\\q, lone \\x9, raw newline) is a PARSE error, not
    a pass-through."""
    out = go_unquote(s)
    if out is None:
        raise ValueError(f"OTTL parse: invalid string literal {s}")
    return out


_VALUE_END = ("num", "str", "hex", "rparen", "rbrack")


def tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise ValueError(f"OTTL tokenize error near: {s[pos:]!r}")
            break
        kind, text = m.lastgroup, m.group(m.lastgroup)
        # the num rule greedily lexes '-1'/'+1' — after a value (Len(x)-1)
        # that sign is a BINARY operator, not a sign; split it
        if kind == "num" and text[0] in "+-" and out:
            pk, pv = out[-1]
            if pk in _VALUE_END or (pk == "name" and pv not in _KEYWORDS):
                out.append(("op", text[0]))
                text = text[1:]
        out.append((kind, text))
        pos = m.end()
    out.append(("eof", ""))
    return out


class Parser:
    def __init__(self, s: str):
        self.toks = tokenize(s)
        self.i = 0

    def peek(self, ahead: int = 0):
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def eat(self, kind: str | None = None, val: str | None = None) -> str:
        k, v = self.toks[self.i]
        if (kind and k != kind) or (val is not None and v != val):
            raise ValueError(f"OTTL parse: expected {kind or val}, "
                             f"got {k}:{v!r}")
        self.i += 1
        return v

    # ---- entry points ----
    def parse_statement(self):
        """editor(args) [where cond] -> ("editor", name, args, kwargs, where)."""
        name = self.eat("name")
        if not name[0].islower():
            # grammar.go checkForCustomError: a statement must start with
            # an editor (Lowercase-led function name)
            raise ValueError("editor names must start with a lowercase "
                             f"letter but got '{name}'")
        args, kwargs = self._arglist()
        if self.peek()[0] == "lbrack":
            raise ValueError("only paths and converters may be indexed, "
                             f"not editors, but got {name}")
        where = None
        if self.peek() == ("name", "where"):
            self.eat()
            where = self.parse_expr()
        self.eat("eof")
        return ("editor", name, args, kwargs, where)

    def parse_condition(self):
        e = self.parse_expr()
        self.eat("eof")
        return e

    # ---- expressions ----
    def parse_expr(self):
        return self._or()

    def _or(self):
        e = self._and()
        parts = [e]
        while self.peek() == ("name", "or"):
            self.eat()
            parts.append(self._and())
        return parts[0] if len(parts) == 1 else ("bool", "or", parts)

    def _and(self):
        parts = [self._not()]
        while self.peek() == ("name", "and"):
            self.eat()
            parts.append(self._not())
        return parts[0] if len(parts) == 1 else ("bool", "and", parts)

    def _not(self):
        if self.peek() == ("name", "not"):
            self.eat()
            return ("not", self._not())
        return self._cmp()

    def _cmp(self):
        left = self._sum()
        k, v = self.peek()
        if k == "op" and v in ("==", "!=", "<", "<=", ">", ">="):
            self.eat()
            return ("binop", v, left, self._sum())
        return left

    def _sum(self):
        e = self._term()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.eat()
            e = ("binop", op, e, self._term())
        return e

    def _term(self):
        e = self._primary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/"):
            op = self.eat()
            e = ("binop", op, e, self._primary())
        return e

    def _primary(self):
        k, v = self.peek()
        if k == "lparen":
            self.eat()
            e = self.parse_expr()
            self.eat("rparen")
            return e
        if k == "str":
            self.eat()
            return ("lit", _unescape(v))
        if k == "num":
            self.eat()
            return ("lit", float(v) if ("." in v or "e" in v or "E" in v)
                    else int(v))
        if k == "hex":
            self.eat()
            h = v[2:]
            if len(h) % 2:
                h = "0" + h
            return ("lit", bytes.fromhex(h))
        if k == "lbrack":
            return ("list", self._list_body())
        if k == "lbrace":
            return ("map", self._map_body())
        if k == "name":
            if v == "nil":
                self.eat()
                return ("lit", None)
            if v in ("true", "false"):
                self.eat()
                return ("lit", v == "true")
            if v in ENUMS:
                self.eat()
                return ("lit", ENUMS[v])
            if self.peek(1)[0] == "lparen":  # converter call
                if not v[0].isupper():
                    # grammar.go custom error: a function in expression
                    # position must be a converter (Uppercase-led)
                    raise ValueError(
                        "converter names must start with an uppercase "
                        f"letter but got '{v}'")
                self.eat()
                args, kwargs = self._arglist()
                node = ("call", v, args, kwargs)
                return self._indexes_on(node)
            if v[0].isupper():
                # grammar.go: a bare Uppercase-led token is either an enum
                # symbol (all-caps `Uppercase (?! Lowercase)` in value
                # position, resolved via the context's parseEnum) or a
                # converter reference (argument.FunctionName — mixed-case
                # allowed, e.g. the `function` param of replace_pattern).
                # The parser is type-blind like participle's: emit
                # ("fname", v) and let compilation decide; evaluating one
                # as a value raises 'enum symbol not found' (eval_expr).
                self.eat()
                return ("fname", v)
            return self._path()
        raise ValueError(f"OTTL parse: unexpected {k}:{v!r}")

    def _indexes_on(self, node):
        """Postfix [index] access on a call/list result, e.g.
        Split(x, "h")[1]."""
        while self.peek()[0] == "lbrack":
            self.eat()
            idx = self.parse_expr()
            self.eat("rbrack")
            node = ("index", node, idx)
        return node

    def _path(self):
        segs = []
        while True:
            name = self.eat("name")
            if not _FIELD_RE.match(name):
                raise ValueError(
                    f"OTTL parse: invalid path segment '{name}' — a path "
                    "field is a single lowercase token (grammar.go field)")
            idxs = []
            while self.peek()[0] == "lbrack":
                self.eat()
                idxs.append(self.parse_expr())
                self.eat("rbrack")
            segs.append((name, idxs))
            if self.peek()[0] == "dot":
                self.eat()
                continue
            break
        return ("path", segs)

    def _arglist(self):
        self.eat("lparen")
        args, kwargs = [], {}
        while self.peek()[0] != "rparen":
            k, v = self.peek()
            # named argument: name=expr (but a bare path also starts with
            # name — disambiguate on the '=' that is NOT '==')
            if k == "name" and self.peek(1) == ("eq", "=") \
                    and v not in _KEYWORDS:
                self.eat()
                self.eat("eq")
                kwargs[v] = self.parse_expr()
            else:
                args.append(self.parse_expr())
            if self.peek()[0] == "comma":
                self.eat()
            elif self.peek()[0] != "rparen":
                raise ValueError(
                    f"OTTL parse: expected ',' or ')' between arguments, "
                    f"got {self.peek()!r}")
        self.eat("rparen")
        return args, kwargs

    def _list_body(self):
        self.eat("lbrack")
        out = []
        while self.peek()[0] != "rbrack":
            out.append(self.parse_expr())
            if self.peek()[0] == "comma":
                self.eat()
            elif self.peek()[0] != "rbrack":
                raise ValueError(
                    f"OTTL parse: expected ',' or ']' in list, "
                    f"got {self.peek()!r}")
        self.eat("rbrack")
        return out

    def _map_body(self):
        self.eat("lbrace")
        out = []
        while self.peek()[0] != "rbrace":
            k = _unescape(self.eat("str"))
            self.eat("colon")
            out.append((k, self.parse_expr()))
            if self.peek()[0] == "comma":
                self.eat()
        self.eat("rbrace")
        return out


def parse_statement(s: str):
    return Parser(s).parse_statement()


def parse_ottl_condition(s: str):
    return Parser(s).parse_condition()
