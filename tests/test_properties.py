"""Property-based tests (hypothesis) for the vectorized parser kernels.

These pin the algebraic contracts the example-based suites can't sweep:
round-trips, agreement between the vectorized fast paths and their exact
reference semantics, and floor/truncate arithmetic across the whole
input domain. Pure-kernel tests — no Ray session needed.
"""

import json

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from opentelemetry_collector_contrib_ray.functions import ottl
from opentelemetry_collector_contrib_ray.functions.maps import (
    to_key_value_string)
from opentelemetry_collector_contrib_ray.pipelines.statements import (
    _kv_to_map)

# keys/values that survive the kv wire format unquoted: no delimiters, no
# quote/backslash characters (the writer leaves ' and \\ untouched while
# the parseutils parser treats them as quoting/escape syntax — the
# REFERENCE roundtrip is lossy for them too: a bare ' key errors as an
# unterminated quote), non-empty, no surrounding whitespace
_safe = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126,
                           blacklist_characters='="\'\\'),
    min_size=1, max_size=12)
# values may additionally contain the delimiters — the writer quotes them
_quotable = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           blacklist_characters='"\'\\'),
    min_size=1, max_size=20).filter(lambda s: s == s.strip())


@settings(max_examples=60, deadline=None)
@given(st.dictionaries(_safe, _quotable, min_size=1, max_size=6))
def test_kv_roundtrip_write_then_parse(d):
    """ToKeyValueString(sortKeys) -> ParseKeyValue recovers the map: the
    writer quotes any key/value containing a delimiter, and the parser's
    quote handling must undo exactly that."""
    m = pa.array([list(d.items())], pa.map_(pa.string(), pa.string()))
    wire = to_key_value_string(m, "=", " ", sort_keys=True)
    back = _kv_to_map(wire, "=", " ")
    got = dict(back.to_pylist()[0])
    # keys containing a delimiter are quoted on write but the parser keeps
    # the quotes as part of the key text (reference parseutils does the
    # same: only VALUES are unquoted) — skip those pathological keys
    want = {k: v for k, v in d.items()
            if "=" not in k and " " not in k}
    got = {k: v for k, v in got.items() if k in want}
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_safe.filter(lambda s: "=" not in s
                                       and " " not in s),
                          _safe), min_size=1, max_size=8))
def test_kv_single_vs_multichar_delim_paths_agree(pairs):
    """The vectorized token-regex path (1-char delims) and the exact scan
    path (multi-char delims) implement the same grammar: parsing the same
    logical payload written with 1-char and 2-char pair delimiters must
    yield identical maps."""
    d = dict(pairs)
    wire1 = " ".join(f"{k}={v}" for k, v in d.items())
    wire2 = "; ".join(f"{k}={v}" for k, v in d.items())
    one = dict(_kv_to_map(pa.array([wire1]), "=", " ").to_pylist()[0])
    two = dict(_kv_to_map(pa.array([wire2]), "=", "; ").to_pylist()[0])
    assert one == d and two == d


@settings(max_examples=100, deadline=None)
# stay inside the ns-representable int64 domain: beyond |2^63/1000| us
# Go's UnixNano is documented undefined (it wraps, exactly like Arrow)
@given(st.integers(min_value=-2**52, max_value=2**52))
def test_unix_epoch_floor_matches_python_floordiv(us):
    """Go's Unix()/UnixMilli() floor: python's // is floored division, so
    it is the ground truth for every sign/magnitude."""
    a = pa.array([us], pa.timestamp("us"))
    assert ottl.unix_seconds(a).to_pylist() == [us // 1_000_000]
    assert ottl.unix_milli(a).to_pylist() == [us // 1_000]
    assert ottl.unix_nano(a).to_pylist() == [us * 1_000]


@settings(max_examples=60, deadline=None)
@given(st.dictionaries(
    st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1, max_size=8),
    st.one_of(st.integers(min_value=-10**9, max_value=10**9),
              st.booleans(),
              st.text(alphabet=st.characters(min_codepoint=32,
                                             max_codepoint=126),
                      max_size=20)),
    min_size=1, max_size=6))
def test_parse_json_fast_path_matches_scan_encoding(d):
    """The uniform-corpus vectorized ParseJSON and the exact scan encode
    scalar values identically (Go-style bools, str() ints)."""
    from opentelemetry_collector_contrib_ray.pipelines.statements import (
        _adapter_parse_json, _json_to_map_fast)

    class _Ctx:
        n = 1

    body = json.dumps(d)
    got = _adapter_parse_json(_Ctx, [pa.array([body])], {})
    want = {k: ("true" if v is True else "false" if v is False else str(v))
            for k, v in d.items()}
    assert dict(got.to_pylist()[0]) == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(
    st.text(alphabet=st.characters(min_codepoint=97, max_codepoint=122),
            min_size=1, max_size=6),
    st.text(alphabet=st.characters(min_codepoint=48, max_codepoint=57),
            min_size=1, max_size=6)), min_size=1, max_size=6))
def test_keyvalue_parser_dynamic_last_wins(pairs):
    """stanza keyvalue_parser dynamic path: repeated keys keep the LAST
    value (dict-assignment order), whatever the key set."""
    from opentelemetry_collector_contrib_ray.stages.parse import (
        keyvalue_parser)
    text = " ".join(f"{k}={v}" for k, v in pairs)
    want = {}
    for k, v in pairs:
        want[k] = v
    out = keyvalue_parser()(pa.table({"text": [text]}))
    got = {c[len("attr_"):]: out[c].to_pylist()[0]
           for c in out.column_names if c.startswith("attr_")}
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(
        st.one_of(st.none(),
                  st.text(alphabet="ab\x1f:N0123", max_size=6)),
        st.one_of(st.none(),
                  st.text(alphabet="ab\x1f:N0123", max_size=6))),
    min_size=2, max_size=8))
def test_canonical_identity_injective(rows):
    """Length-prefix encoding: two rows get the same identity IFF their
    column tuples are equal — no separator/marker content can collide."""
    from opentelemetry_collector_contrib_ray.stages.aggregate import (
        canonical_identity)
    t = pa.table({"x": pa.array([r[0] for r in rows], pa.string()),
                  "y": pa.array([r[1] for r in rows], pa.string())})
    ids = canonical_identity(t, ["x", "y"]).to_pylist()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            assert (ids[i] == ids[j]) == (rows[i] == rows[j]), \
                (rows[i], rows[j], ids[i], ids[j])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(
    st.text(alphabet="abcd", min_size=1, max_size=3),
    st.text(alphabet="0123", max_size=3)), max_size=6),
    st.text(alphabet="abcd", min_size=1, max_size=3),
    st.text(alphabet="0123", max_size=3))
def test_map_set_in_place_roundtrip(entries, key, val):
    """pcommon Put* semantics: after map_set, map_get returns the value,
    entry order of untouched keys is preserved, and the key appears
    exactly once."""
    import pyarrow as pa
    from opentelemetry_collector_contrib_ray.functions import maps as M
    # dedupe entries like pcommon maps (unique keys, first build wins)
    seen = {}
    for k, v in entries:
        seen[k] = v
    row = list(seen.items())
    m = pa.array([row], pa.map_(pa.string(), pa.string()))
    out = M.map_set(m, key, val)
    got = out.to_pylist()[0]
    assert M.map_get(out, key).to_pylist() == [val]
    assert [k for k, _ in got].count(key) == 1
    expect_keys = [k for k, _ in row] + ([key] if key not in seen else [])
    assert [k for k, _ in got] == expect_keys


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=9), min_size=1,
                max_size=8),
       st.integers(min_value=1, max_value=20),
       st.integers(min_value=1, max_value=200))
def test_group_safe_spans_never_split_groups(group_sizes, rg_size,
                                             target_rows):
    """Any sorted-by-group file, any row-group size, any target: spans
    cover every row group exactly once and no group straddles a cut."""
    import tempfile

    import pyarrow.parquet as pq
    from opentelemetry_collector_contrib_ray.sources.grouped import (
        _group_safe_spans)
    keys = [f"g{i:02d}" for i, n in enumerate(group_sizes)
            for _ in range(n)]
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "v": pa.array(range(len(keys)), pa.int64())})
    with tempfile.NamedTemporaryFile(suffix=".parquet") as f:
        pq.write_table(t, f.name, row_group_size=rg_size)
        md = pq.ParquetFile(f.name).metadata
        spans = _group_safe_spans(f.name, "k", target_rows)
        # coverage: contiguous, complete, non-overlapping
        assert spans[0][0] == 0 and spans[-1][1] == md.num_row_groups
        for (a, b), (c, d) in zip(spans, spans[1:]):
            assert b == c
        # containment: no group crosses a span boundary
        pf = pq.ParquetFile(f.name)
        for (_, b), (c, _) in zip(spans, spans[1:]):
            left = pf.read_row_group(b - 1, columns=["k"])["k"][-1].as_py()
            right = pf.read_row_group(c, columns=["k"])["k"][0].as_py()
            assert left != right
