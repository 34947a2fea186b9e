"""Go strconv string semantics shared by the stanza unquote transformer
(stages/transform.py) and the OTTL statement lexer (functions/ottl_parser.py
-- participle.Unquote("String") in pkg/ottl/parser.go:310 routes string
literals through strconv.Unquote, so both surfaces share one decoder)."""

from __future__ import annotations

_GO_SIMPLE_ESCAPES = {"a": "\a", "b": "\b", "f": "\f", "n": "\n",
                      "r": "\r", "t": "\t", "v": "\v", "\\": "\\"}


def go_unquote(s: str) -> str | None:
    """strconv.Unquote: double-quoted strings with full Go escape decoding
    (\\n, \\xNN, \\uNNNN, \\UNNNNNNNN, 3-digit octal), backquoted raw
    strings (carriage returns discarded), single quotes only around ONE
    character. None = ErrSyntax (the transformer passes the value through
    unchanged under on_error=send).

    Go strings are byte strings: \\xNN and octal escapes append RAW
    BYTES (a UTF-8 pair like \\xc3\\xa9 decodes to one é), so output
    accumulates as bytes and UTF-8-decodes at the end
    (surrogateescape keeps Go's invalid-UTF-8-tolerant behavior
    representable in a Python str)."""
    if len(s) < 2 or s[0] != s[-1] or s[0] not in "\"'`":
        return None
    q, body = s[0], s[1:-1]
    if q == "`":
        return None if "`" in body else body.replace("\r", "")

    def one(i: int) -> tuple[bytes, int, bool] | None:
        """-> (decoded bytes, next index, was_escape)"""
        c = body[i]
        if c == "\n" or c == q:
            return None
        if c != "\\":
            return c.encode("utf-8"), i + 1, False
        if i + 1 >= len(body):
            return None
        e = body[i + 1]
        if e in _GO_SIMPLE_ESCAPES:
            return _GO_SIMPLE_ESCAPES[e].encode(), i + 2, True
        if e in "'\"":
            return (e.encode(), i + 2, True) if e == q else None
        if e in "xuU":
            width = {"x": 2, "u": 4, "U": 8}[e]
            h = body[i + 2:i + 2 + width]
            if len(h) < width or any(c not in "0123456789abcdefABCDEF"
                                     for c in h):
                return None
            v = int(h, 16)
            if e == "x":
                return bytes([v]), i + 2 + width, True  # raw byte
            if 0xD800 <= v <= 0xDFFF or v > 0x10FFFF:
                return None
            return chr(v).encode("utf-8"), i + 2 + width, True
        if e in "01234567":
            o = body[i + 1:i + 4]
            if len(o) < 3 or any(c not in "01234567" for c in o):
                return None
            v = int(o, 8)
            return (bytes([v]), i + 4, True) if v <= 255 else None
        return None

    out, i, n_items = bytearray(), 0, 0
    while i < len(body):
        r = one(i)
        if r is None:
            return None
        out.extend(r[0])
        i = r[1]
        n_items += 1
    if q == "'" and n_items != 1:  # rune literal: exactly one char
        return None
    return out.decode("utf-8", errors="surrogateescape")
