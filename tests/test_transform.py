"""Transformer / attributes-action / sampler / redaction tests
(SURVEY.md §2.4, §2.6)."""

import hashlib

import numpy as np
import pyarrow as pa

from opentelemetry_collector_contrib_ray.expr import col
from opentelemetry_collector_contrib_ray.stages import transform as tr


def _b():
    return pa.table({
        "a": ["x", None, "z"],
        "n": ["1", "2", "oops"],
        "sev": pa.array([5, 17, 21], pa.int32()),
    })


def test_add_static_and_expr_with_gate():
    out = tr.add("flag", value="hi")(_b())
    assert out["flag"].to_pylist() == ["hi"] * 3
    out = tr.add("big", expr=col("sev") >= 17, where=col("a").is_null() == False)(_b())  # noqa: E712
    assert out["big"].to_pylist() == [False, None, True]


def test_remove_move_copy_retain():
    b = _b()
    assert "a" not in tr.remove(["a", "zz"])(b).column_names
    m = tr.move("a", "renamed")(b)
    assert "a" not in m.column_names and m["renamed"].to_pylist()[0] == "x"
    c = tr.copy("a", "dup")(b)
    assert c["dup"].to_pylist() == c["a"].to_pylist()
    r = tr.retain(["sev"])(b)
    assert r.column_names == ["sev"]


def test_unquote():
    b = pa.table({"t": ['"q"', 'no', '"', None, '""']})
    out = tr.unquote("t")(b)
    assert out["t"].to_pylist() == ["q", "no", '"', None, ""]


def test_regex_replace():
    b = pa.table({"t": ["id=123 ok", "id=9", "none"]})
    out = tr.regex_replace("t", r"id=\d+", "id=***")(b)
    assert out["t"].to_pylist() == ["id=*** ok", "id=***", "none"]


def test_filter_drop_full_and_ratio():
    b = _b()
    out = tr.filter_drop(col("sev") >= 17)(b)
    assert out["sev"].to_pylist() == [5]
    # ratio: deterministic by key hash; 0.0 keeps all, 1.0 drops all matches
    keep_all = tr.filter_drop(col("sev") >= 0, drop_ratio=0.0, seed_col="a")(b)
    assert keep_all.num_rows == 3


def test_attr_actions():
    b = _b()
    ins = tr.attr_insert("a", "filled")(b)
    assert ins["a"].to_pylist() == ["x", "filled", "z"]
    upd = tr.attr_update("a", "set")(b)
    assert upd["a"].to_pylist() == ["set", None, "set"]
    ups = tr.attr_upsert("b2", from_attribute="a")(b)
    assert ups["b2"].to_pylist() == ["x", None, "z"]
    cv = tr.attr_convert("n", "int")(b)
    assert cv["n"].to_pylist() == [1, 2, None]


def test_attr_hash_matches_hashlib():
    b = _b()
    out = tr.attr_hash(["a"], "sha256")(b)
    assert out["a"].to_pylist()[0] == hashlib.sha256(b"x").hexdigest()
    assert out["a"].to_pylist()[1] is None


def test_attr_extract():
    b = pa.table({"t": ["code=E7 n=1", "nope"]})
    out = tr.attr_extract("t", r"code=(?P<xcode>\w+)")(b)
    assert out["xcode"].to_pylist() == ["E7", None]


def test_fnv1a_matches_reference_vectors():
    # published FNV-1a 64 test vectors (public domain)
    import pyarrow as pa
    got = tr.fnv1a_64(pa.array(["", "a", "foobar"]))
    assert got[0] == 0xcbf29ce484222325
    assert got[1] == 0xaf63dc4c8601ec8c
    assert got[2] == 0x85944171f73967e8


def test_probabilistic_sampler_deterministic_and_proportional():
    keys = pa.array([f"conv-{i:08d}" for i in range(20000)])
    b = pa.table({"k": keys})
    s25 = tr.probabilistic_sampler(25.0, "k")(b)
    s25b = tr.probabilistic_sampler(25.0, "k")(b)
    assert s25.num_rows == s25b.num_rows  # deterministic
    assert abs(s25.num_rows / 20000 - 0.25) < 0.03  # proportional
    s100 = tr.probabilistic_sampler(100.0, "k")(b)
    assert s100.num_rows == 20000
    # subset property: rows kept at 10% are kept at 25%
    s10 = set(tr.probabilistic_sampler(10.0, "k")(b)["k"].to_pylist())
    assert s10 <= set(s25["k"].to_pylist())


def test_md5_sampler_matches_duckdb():
    import duckdb
    keys = [f"conv-{i:04d}" for i in range(500)]
    b = pa.table({"k": pa.array(keys)})
    ours = tr.md5_mod_sampler(20.0, "k")(b)["k"].to_pylist()
    want = [r[0] for r in duckdb.sql(
        "SELECT k FROM b WHERE CAST(('0x' || substring(md5(k),1,8)) AS BIGINT)"
        " % 10000 < 2000").fetchall()]
    assert ours == want


def test_redact():
    b = pa.table({
        "t": ["card 4111-1111-1111-1111 used", "clean", "ssn 123-45-6789"],
    })
    out = tr.redact(["t"], [r"\d{4}-\d{4}-\d{4}-\d{4}", r"\d{3}-\d{2}-\d{4}"])(b)
    assert out["t"].to_pylist() == ["card **** used", "clean", "ssn ****"]
    assert out["redacted_count"].to_pylist() == [1, 0, 1]


def test_chain():
    fn = tr.chain(tr.add("x", value="1"), tr.attr_convert("x", "int"))
    assert fn(_b())["x"].to_pylist() == [1, 1, 1]


def test_hash_unit_interval_range():
    v = tr.hash_unit_interval(pa.array(["a", "b", None]))
    assert ((v >= 0) & (v < 1)).all()
    assert v[2] == 0.0
    assert isinstance(v, np.ndarray)


def test_range_lookup_enricher():
    from opentelemetry_collector_contrib_ray.stages.enrich import (
        RangeLookupEnricher,
    )
    ranges = [(0xCB007100, 0xCB0071FF, "testnet"),
              (0x0A000000, 0x0AFFFFFF, "private")]
    e = RangeLookupEnricher(ranges, "ip", "net", key_is_ip=True,
                            default="unknown")
    b = pa.table({"ip": ["203.0.113.7", "10.1.2.3", "8.8.8.8", "bad", None]})
    assert e(b)["net"].to_pylist() == [
        "testnet", "private", "unknown", "unknown", "unknown"]


def test_assign_keys():
    b = pa.table({"parts": pa.array([["a", "b", "c"], ["x"]],
                                    pa.list_(pa.string()))})
    out = tr.assign_keys("parts", ["first", "second"])(b)
    assert out["first"].to_pylist() == ["a", "x"]
    assert out["second"].to_pylist() == ["b", None]


def test_schema_processor_version_chain():
    from opentelemetry_collector_contrib_ray.stages.schema import (
        schema_transform,
    )

    translations = {
        "1.1.0": {"http.method": "http.request.method"},
        "1.2.0": {"http.request.method": "http.req.method",
                  "net.peer.ip": "client.address"},
        "2.0.0": {"never.applied": "x"},
    }
    t = pa.table({"http.method": ["GET"], "net.peer.ip": ["1.2.3.4"],
                  "other": [1]})
    out = schema_transform(translations, "1.0.0", "1.2.0")(t)
    # chained: http.method -> http.request.method -> http.req.method
    assert out.column_names == ["http.req.method", "client.address", "other"]
    # zero steps -> identity
    same = schema_transform(translations, "1.2.0", "1.2.0")(t)
    assert same.column_names == t.column_names


def test_resource_detection_detectors(monkeypatch):
    from opentelemetry_collector_contrib_ray.stages.enrich import (
        resource_detection,
    )

    monkeypatch.setenv("OTEL_RESOURCE_ATTRIBUTES",
                       "deployment.environment=prod, service.version=1.2")
    fn = resource_detection(detectors=["system", "env"],
                            override={"cluster": "c1"})
    out = fn(pa.table({"x": [1, 2]}))
    assert out["deployment.environment"].to_pylist() == ["prod", "prod"]
    assert out["service.version"].to_pylist() == ["1.2", "1.2"]
    assert out["cluster"].to_pylist() == ["c1", "c1"]
    assert out["os.type"].to_pylist()[0] in ("linux", "darwin", "windows")


def test_schema_transform_rename_collision_overwrites():
    from opentelemetry_collector_contrib_ray.stages.schema import (
        schema_transform,
    )

    translations = {"1.1.0": {"http.method": "http.request.method"}}
    t = pa.table({"http.method": ["GET"],
                  "http.request.method": ["stale"], "other": [1]})
    out = schema_transform(translations, "1.0.0", "1.1.0")(t)
    assert out.column_names == ["http.request.method", "other"]
    assert out["http.request.method"].to_pylist() == ["GET"]  # renamed wins


def test_schema_transform_double_rename_last_wins():
    from opentelemetry_collector_contrib_ray.stages.schema import (
        schema_transform,
    )

    t = pa.table({"a": ["va"], "b": ["vb"]})
    out = schema_transform({"1.1.0": {"a": "c", "b": "c"}},
                           "1.0.0", "1.1.0")(t)
    assert out.column_names == ["c"]
    assert out["c"].to_pylist() == ["vb"]  # last rename wins


def test_redact_empty_blocked_values_is_noop():
    from opentelemetry_collector_contrib_ray.stages.transform import redact

    t = pa.table({"x": ["hello"]})
    out = redact(["x"], [])(t)
    assert out["x"].to_pylist() == ["hello"]
    assert out["redacted_count"].to_pylist() == [0]


def test_assign_keys_all_empty_lists(ray_session):
    """An all-empty/null list block must yield null columns, not
    ArrowIndexError (review finding)."""
    t = pa.table({"lst": pa.array([[], [], None],
                                  pa.list_(pa.string()))})
    out = tr.assign_keys("lst", ["a", "b"])(t)
    assert out["a"].to_pylist() == [None, None, None]
    assert out["b"].to_pylist() == [None, None, None]


def test_attr_upsert_missing_from_attribute_is_noop(ray_session):
    """from_attribute naming an absent column = no record carries it ->
    no-op, not KeyError (review finding)."""
    t = pa.table({"x": [1, 2]})
    out = tr.attr_upsert("dest", from_attribute="missing")(t)
    assert out.column_names == ["x"]


def test_gated_move_nulls_moved_rows(ray_session):
    """A row-gated move must null the moved rows' src values — otherwise
    it silently degrades to a gated copy (review finding)."""
    t = pa.table({"a": [1, 2, 3]})
    out = tr.move("a", "b", where=col("a") > 1)(t)
    assert out["b"].to_pylist() == [None, 2, 3]
    assert out["a"].to_pylist() == [1, None, None]


def test_route_attribute_type_conflict_raises(ray_session):
    """Stamping string route attributes into an existing non-string
    column must surface the config conflict, not silently re-type
    unstamped rows (review finding)."""
    import pytest
    from opentelemetry_collector_contrib_ray.stages.route import (
        Route, RouteTable)
    t = pa.table({"r": pa.array([9, 8], pa.int64()),
                  "x": ["a", "b"]})
    rt = RouteTable([Route("s1", col("x") == "a", attributes={"r": "e"})],
                    default="d")
    with pytest.raises(TypeError, match="collides"):
        rt(t)


# ---------------------------------------------------------------------------
# Reference case replay — internal/coreinternal/attraction/attraction_test.go
# (insert/update/upsert x value/from_attribute, delete+regex, ordering),
# transcribed to the column model: each attribute key is a column; a key
# absent from a row's map is an absent column (one-row tables) or a null.
# ---------------------------------------------------------------------------

def _attr_table(attrs: dict) -> pa.Table:
    if not attrs:
        return pa.table({"_rowid": pa.array([0], pa.int64())})
    return pa.table({"_rowid": pa.array([0], pa.int64()),
                     **{k: pa.array([v]) for k, v in attrs.items()}})


def _attrs_of(t: pa.Table) -> dict:
    out = {}
    for c in t.column_names:
        if c == "_rowid":
            continue
        v = t[c].to_pylist()[0]
        if v is not None:
            out[c] = v
    return out


ATTRACTION_CASES = [
    # (name, actions, input, expected)
    # TestAttributes_InsertValue
    ("InsertEmptyAttributes", [("insert", dict(field="attribute1", value=123))],
     {}, {"attribute1": 123}),
    ("InsertKeyNoExists", [("insert", dict(field="attribute1", value=123))],
     {"anotherkey": "bob"}, {"anotherkey": "bob", "attribute1": 123}),
    ("InsertKeyExists", [("insert", dict(field="attribute1", value=123))],
     {"attribute1": "bob"}, {"attribute1": "bob"}),
    # TestAttributes_UpdateValue
    ("UpdateNoAttributes",
     [("update", dict(field="db.secret", value="redacted"))], {}, {}),
    ("UpdateKeyNoExist",
     [("update", dict(field="db.secret", value="redacted"))],
     {"boo": "foo"}, {"boo": "foo"}),
    ("UpdateAttributes",
     [("update", dict(field="db.secret", value="redacted"))],
     {"db.secret": "password1234"}, {"db.secret": "redacted"}),
    # TestAttributes_UpdateFromAttribute
    ("UpdateFA-NoAttributes",
     [("update", dict(field="boo", from_attribute="foo"))], {}, {}),
    ("UpdateFA-KeyNoExistFromAttribute",
     [("update", dict(field="boo", from_attribute="foo"))],
     {"boo": "bob"}, {"boo": "bob"}),
    ("UpdateFA-KeyNoExistMain",
     [("update", dict(field="boo", from_attribute="foo"))],
     {"foo": "over there"}, {"foo": "over there"}),
    ("UpdateFA-FromExisting",
     [("update", dict(field="boo", from_attribute="foo"))],
     {"foo": "there is a party over here", "boo": "not here"},
     {"foo": "there is a party over here",
      "boo": "there is a party over here"}),
    # TestAttributes_UpsertValue
    ("UpsertNoAttributes",
     [("upsert", dict(field="region", value="planet-earth"))], {},
     {"region": "planet-earth"}),
    ("UpsertAttributeNoExist",
     [("upsert", dict(field="region", value="planet-earth"))],
     {"mission": "to mars"},
     {"mission": "to mars", "region": "planet-earth"}),
    ("UpsertAttributeExists",
     [("upsert", dict(field="region", value="planet-earth"))],
     {"mission": "to mars", "region": "solar system"},
     {"mission": "to mars", "region": "planet-earth"}),
    # TestAttributes_UpsertFromAttribute
    ("UpsertFA-Empty",
     [("upsert", dict(field="new_user_key", from_attribute="user_key"))],
     {}, {}),
    ("UpsertFA-NoExist",
     [("upsert", dict(field="new_user_key", from_attribute="user_key"))],
     {"boo": "ghosts are scary"}, {"boo": "ghosts are scary"}),
    ("UpsertFA-ExistsInsert",
     [("upsert", dict(field="new_user_key", from_attribute="user_key"))],
     {"user_key": 2245, "foo": "casper the friendly ghost"},
     {"user_key": 2245, "new_user_key": 2245,
      "foo": "casper the friendly ghost"}),
    ("UpsertFA-ExistsUpdate",
     [("upsert", dict(field="new_user_key", from_attribute="user_key"))],
     {"user_key": 2245, "new_user_key": 5422,
      "foo": "casper the friendly ghost"},
     {"user_key": 2245, "new_user_key": 2245,
      "foo": "casper the friendly ghost"}),
    # TestAttributes_Delete (key + regex on one action)
    ("DeleteEmptyAttributes",
     [("delete", dict(key="duplicate_key",
                      pattern="^duplicate_key_."))], {}, {}),
    ("DeleteAttributeNoExist",
     [("delete", dict(key="duplicate_key", pattern="^duplicate_key_."))],
     {"boo": "ghosts are scary"}, {"boo": "ghosts are scary"}),
    ("DeleteAttributeExists",
     [("delete", dict(key="duplicate_key", pattern="^duplicate_key_."))],
     {"duplicate_key": 3245.6, "original_key": 3245.6},
     {"original_key": 3245.6}),
    ("DeleteRegexp",
     [("delete", dict(key="duplicate_key", pattern="^duplicate_key_."))],
     {"duplicate_key_a": 3245.6, "duplicate_key_b": 3245.6,
      "duplicate_key_c": 3245.6, "original_key": 3245.6,
      "not_duplicate_key": 3246.6},
     {"original_key": 3245.6, "not_duplicate_key": 3246.6}),
    # TestAttributes_Extract (regex named captures; full corpus)
    ("ExtractEmptyAttributes",
     [("extract", dict(field="user_key",
        pattern=r"^/api/v1/document/(?P<new_user_key>.*)/update/(?P<version>.*)$"))],
     {}, {}),
    ("ExtractNoTargetKey",
     [("extract", dict(field="user_key",
        pattern=r"^/api/v1/document/(?P<new_user_key>.*)/update/(?P<version>.*)$"))],
     {"boo": "ghosts are scary"}, {"boo": "ghosts are scary"}),
    ("ExtractNonStringTarget",
     [("extract", dict(field="user_key",
        pattern=r"^/api/v1/document/(?P<new_user_key>.*)/update/(?P<version>.*)$"))],
     {"boo": "ghosts are scary", "user_key": 1234},
     {"boo": "ghosts are scary", "user_key": 1234}),
    ("ExtractNoPatternMatch",
     [("extract", dict(field="user_key",
        pattern=r"^/api/v1/document/(?P<new_user_key>.*)/update/(?P<version>.*)$"))],
     {"user_key": "does not match", "boo": "ghosts are scary"},
     {"user_key": "does not match", "boo": "ghosts are scary"}),
    ("ExtractPartialMatchRejected",
     [("extract", dict(field="user_key",
        pattern=r"^/api/v1/document/(?P<new_user_key>.*)/update/(?P<version>.*)$"))],
     {"user_key": "/api/v1/document/12345678/update",
      "boo": "ghosts are scary"},
     {"user_key": "/api/v1/document/12345678/update",
      "boo": "ghosts are scary"}),
    ("ExtractInsertNewValues",
     [("extract", dict(field="user_key",
        pattern=r"^/api/v1/document/(?P<new_user_key>.*)/update/(?P<version>.*)$"))],
     {"user_key": "/api/v1/document/12345678/update/v1",
      "foo": "casper the friendly ghost"},
     {"user_key": "/api/v1/document/12345678/update/v1",
      "new_user_key": "12345678", "version": "v1",
      "foo": "casper the friendly ghost"}),
    ("ExtractUpdatesExisting",
     [("extract", dict(field="user_key",
        pattern=r"^/api/v1/document/(?P<new_user_key>.*)/update/(?P<version>.*)$"))],
     {"user_key": "/api/v1/document/12345678/update/v1",
      "new_user_key": "2321", "version": "na",
      "foo": "casper the friendly ghost"},
     {"user_key": "/api/v1/document/12345678/update/v1",
      "new_user_key": "12345678", "version": "v1",
      "foo": "casper the friendly ghost"}),
    ("ExtractUpserts",
     [("extract", dict(field="user_key",
        pattern=r"^/api/v1/document/(?P<new_user_key>.*)/update/(?P<version>.*)$"))],
     {"user_key": "/api/v1/document/12345678/update/v1",
      "new_user_key": "2321", "foo": "casper the friendly ghost"},
     {"user_key": "/api/v1/document/12345678/update/v1",
      "new_user_key": "12345678", "version": "v1",
      "foo": "casper the friendly ghost"}),
    # TestAttributes_FromAttributeNoChange (3 chained self-referencing)
    ("FromAttributeNoChange",
     [("insert_fa", dict(field="boo", from_attribute="boo")),
      ("update", dict(field="boo", from_attribute="boo")),
      ("upsert", dict(field="boo", from_attribute="boo"))],
     {"boo": "ghosts are scary"}, {"boo": "ghosts are scary"}),
    # TestAttributes_Ordering (insert -> upsert-from -> delete chains)
    ("OrderingApplyAllSteps",
     [("insert", dict(field="operation", value="default")),
      ("upsert", dict(field="svc.operation", from_attribute="operation")),
      ("delete", dict(key="operation"))],
     {"foo": "casper the friendly ghost"},
     {"foo": "casper the friendly ghost", "svc.operation": "default"}),
    ("OrderingOperationExists",
     [("insert", dict(field="operation", value="default")),
      ("upsert", dict(field="svc.operation", from_attribute="operation")),
      ("delete", dict(key="operation"))],
     {"foo": "casper the friendly ghost", "operation": "arithmetic"},
     {"foo": "casper the friendly ghost", "svc.operation": "arithmetic"}),
    ("OrderingSvcOperationExists",
     [("insert", dict(field="operation", value="default")),
      ("upsert", dict(field="svc.operation", from_attribute="operation")),
      ("delete", dict(key="operation"))],
     {"foo": "casper the friendly ghost", "svc.operation": "some value"},
     {"foo": "casper the friendly ghost", "svc.operation": "default"}),
    ("OrderingBothAttributesExist",
     [("insert", dict(field="operation", value="default")),
      ("upsert", dict(field="svc.operation", from_attribute="operation")),
      ("delete", dict(key="operation"))],
     {"foo": "casper the friendly ghost", "operation": "arithmetic",
      "svc.operation": "add"},
     {"foo": "casper the friendly ghost", "svc.operation": "arithmetic"}),
]


def _run_actions(t: pa.Table, actions):
    for kind, kw in actions:
        if kind == "insert":
            t = tr.attr_insert(**kw)(t)
        elif kind == "insert_fa":
            # INSERT FromAttribute: set only when target missing AND
            # source present — expressible as upsert gated on target null
            field, src = kw["field"], kw["from_attribute"]
            if src in t.column_names:
                if field not in t.column_names:
                    t = tr.attr_upsert(field, from_attribute=src)(t)
                else:
                    from opentelemetry_collector_contrib_ray.expr import col
                    t = tr.attr_upsert(field, from_attribute=src,
                                       where=col(field).is_null())(t)
        elif kind == "update":
            t = tr.attr_update(**kw)(t)
        elif kind == "upsert":
            t = tr.attr_upsert(**kw)(t)
        elif kind == "extract":
            t = tr.attr_extract(**kw)(t)
        elif kind == "delete":
            t = tr.attr_delete(**kw)(t)
    return t


import pytest


@pytest.mark.parametrize("name,actions,inp,want", ATTRACTION_CASES,
                         ids=[c[0] for c in ATTRACTION_CASES])
def test_attraction_reference_cases(name, actions, inp, want, ray_session):
    out = _run_actions(_attr_table(inp), actions)
    assert _attrs_of(out) == want, name


def test_attr_hash_typed_encodings(ray_session):
    """hasher.go: string=utf8, int=8-byte LE, double=float64-bits LE,
    bool=one byte 1/0 — not string forms (reference HashValue corpus)."""
    import hashlib as _h
    import struct
    t = pa.table({
        "s": ["foo"], "i": pa.array([123], pa.int64()),
        "d": pa.array([234.129312], pa.float64()),
        "bt": pa.array([True]), "bf": pa.array([False])})
    out = tr.attr_hash(["s", "i", "d", "bt", "bf"])(t)
    assert out["s"].to_pylist() == [_h.sha256(b"foo").hexdigest()]
    assert out["i"].to_pylist() == \
        [_h.sha256(struct.pack("<q", 123)).hexdigest()]
    assert out["d"].to_pylist() == \
        [_h.sha256(struct.pack("<d", 234.129312)).hexdigest()]
    assert out["bt"].to_pylist() == [_h.sha256(b"\x01").hexdigest()]
    assert out["bf"].to_pylist() == [_h.sha256(b"\x00").hexdigest()]


def test_attr_convert_reference_semantics(ray_session):
    """type_converter.go: double->int truncates toward zero, bool->1/0,
    int->double exact, numeric strings parse; unparseable strings null
    (documented divergence #4: the reference leaves them unchanged)."""
    t = pa.table({
        "d": pa.array([1.9, -1.9, 2.0], pa.float64()),
        "b": pa.array([True, False, True]),
        "i": pa.array([5, -7, 0], pa.int64()),
        "s": pa.array(["123", "-9", "not-a-number"]),
    })
    assert tr.attr_convert("d", "int")(t)["d"].to_pylist() == [1, -1, 2]
    assert tr.attr_convert("b", "int")(t)["b"].to_pylist() == [1, 0, 1]
    assert tr.attr_convert("b", "double")(t)["b"].to_pylist() == \
        [1.0, 0.0, 1.0]
    assert tr.attr_convert("i", "double")(t)["i"].to_pylist() == \
        [5.0, -7.0, 0.0]
    assert tr.attr_convert("s", "int")(t)["s"].to_pylist() == \
        [123, -9, None]
    assert tr.attr_convert("i", "string")(t)["i"].to_pylist() == \
        ["5", "-7", "0"]


# processor/schemaprocessor/internal/translation/testdata/
# complex_changeset.yml — reference TEST DATA replayed as the semconv
# translation fixture (versions section only, spans/span_events omitted:
# span-scope is outside the log pipeline)
_COMPLEX_CHANGESET = """
versions:
  1.7.0:
    logs:
      changes:
      - rename_attributes:
          attribute_map:
            process.stacktrace: application.stacktrace
  1.5.0:
    metrics:
      changes:
      - rename_metrics:
          container.restart: container.restart.total
  1.4.0: {}
  1.2.0:
    all:
      changes:
      - rename_attributes:
          attribute_map:
            test.suite: test.name
  1.1.0:
    all:
      changes:
      - rename_attributes:
          attribute_map:
            test-suite: test.suite
    resources:
      changes:
      - rename_attributes:
          attribute_map:
            resource-description: resource.description
    metrics:
      changes:
      - rename_metrics:
          container.respawn: container.restart
      - rename_attributes:
          attribute_map:
            container-exit-code: container.exit.status
          apply_to_metrics:
          - container.stop
          - container.restart
    logs:
      changes:
      - rename_attributes:
          attribute_map:
            go.stacktrace: process.stacktrace
  1.0.0: {}
"""


def _log_table_at(version):
    # translation_helpers_test.go NewExampleLogs, flat-model form
    cols = {
        "1.0.0": {"test-suite": "T", "go.stacktrace": "func main()"},
        "1.1.0": {"test.suite": "T", "process.stacktrace": "func main()"},
        "1.2.0": {"test.name": "T", "process.stacktrace": "func main()"},
        "1.7.0": {"test.name": "T",
                  "application.stacktrace": "func main()"},
    }[version]
    cols = {k: pa.array([v]) for k, v in cols.items()}
    cols["severity_text"] = pa.array(["ERROR"])
    cols["body"] = pa.array(["bad program"])
    return pa.table(cols)


def test_semconv_log_translation_replays_reference_scenarios():
    from opentelemetry_collector_contrib_ray.stages.schema import (
        parse_schema_file, semconv_log_transform)
    versions = parse_schema_file(_COMPLEX_CHANGESET)
    # TestTranslationLogChanges upgrade scenarios (1.4.0/1.5.0 == 1.2.0)
    for target, want in [("1.1.0", "1.1.0"), ("1.2.0", "1.2.0"),
                         ("1.4.0", "1.2.0"), ("1.5.0", "1.2.0"),
                         ("1.7.0", "1.7.0")]:
        got = semconv_log_transform(versions, "1.0.0", target)(
            _log_table_at("1.0.0"))
        assert got.equals(_log_table_at(want)), target
    # no-change and downgrade-to-original scenarios
    same = semconv_log_transform(versions, "1.1.0", "1.1.0")(
        _log_table_at("1.1.0"))
    assert same.equals(_log_table_at("1.1.0"))
    down = semconv_log_transform(versions, "1.7.0", "1.0.0")(
        _log_table_at("1.7.0"))
    assert down.equals(_log_table_at("1.0.0"))


def _metric_table_at(version):
    # NewExampleMetrics flat-model form (one histogram row)
    name = {"1.0.0": "container.respawn", "1.2.0": "container.restart",
            "1.7.0": "container.restart.total"}[version]
    attr = "container-exit-code" if version == "1.0.0" \
        else "container.exit.status"
    return pa.table({"metric_name": pa.array([name]),
                     attr: pa.array([124], pa.int64())})


def _drop_all_null(t):
    # conditional renames keep the vacated source column as typed nulls
    # (a PLAN-time schema decision — per-batch content-dependent drops
    # made blocks of one dataset disagree on schema)
    keep = [c for c in t.column_names
            if t[c].null_count < len(t[c]) or len(t[c]) == 0]
    return t.select(keep)


def test_semconv_metric_translation_replays_reference_scenarios():
    from opentelemetry_collector_contrib_ray.stages.schema import (
        parse_schema_file, semconv_metric_transform)
    versions = parse_schema_file(_COMPLEX_CHANGESET)
    for target, want in [("1.2.0", "1.2.0"), ("1.7.0", "1.7.0")]:
        got = _drop_all_null(semconv_metric_transform(
            versions, "1.0.0", target)(_metric_table_at("1.0.0")))
        w = _metric_table_at(want)
        assert got.select(sorted(got.column_names)).equals(
            w.select(sorted(w.column_names))), target
    down = _drop_all_null(semconv_metric_transform(
        versions, "1.7.0", "1.0.0")(_metric_table_at("1.7.0")))
    w = _metric_table_at("1.0.0")
    assert down.select(sorted(down.column_names)).equals(
        w.select(sorted(w.column_names)))


def test_semconv_metric_conditional_rename_schema_is_content_independent():
    from opentelemetry_collector_contrib_ray.stages.schema import (
        parse_schema_file, semconv_metric_transform)
    versions = parse_schema_file(_COMPLEX_CHANGESET)
    fn = semconv_metric_transform(versions, "1.0.0", "1.2.0")
    all_match = _metric_table_at("1.0.0")
    with_other = pa.table({
        "metric_name": pa.array(["container.respawn", "other"]),
        "container-exit-code": pa.array([124, 9], pa.int64())})
    # blocks with different row content agree on the output schema
    assert fn(all_match).schema.names == fn(with_other).schema.names
    pa.concat_tables([fn(all_match), fn(with_other)])  # must not raise


def test_semconv_conditional_metric_rename_gates_on_name():
    from opentelemetry_collector_contrib_ray.stages.schema import (
        parse_schema_file, semconv_metric_transform)
    versions = parse_schema_file(_COMPLEX_CHANGESET)
    # one row matches apply_to_metrics after rename_metrics, one does not
    t = pa.table({"metric_name": pa.array(["container.respawn", "other"]),
                  "container-exit-code": pa.array([124, 9], pa.int64())})
    out = semconv_metric_transform(versions, "1.0.0", "1.1.0")(t)
    assert out["metric_name"].to_pylist() == ["container.restart", "other"]
    assert out["container.exit.status"].to_pylist() == [124, None]
    assert out["container-exit-code"].to_pylist() == [None, 9]


def test_unquote_strconv_reference_cases():
    """transformer/unquote/transformer_test.go replayed: strconv.Unquote
    semantics — escapes decoded in double quotes, raw backquotes, single
    quotes only for one character, ErrSyntax rows pass through."""
    from opentelemetry_collector_contrib_ray.stages.transform import (
        unquote)
    cases = [
        ("val", "val"),             # not_quoted -> error -> unchanged
        ('"val"', "val"),           # double_quoted
        ("`val`", "val"),           # back_quoted
        ("'v'", "v"),               # single char rune
        ("'val'", "'val'"),         # multi-char rune -> error -> unchanged
        ('"a\\nb"', "a\nb"),        # escape decoding
        ('"a\\x41b"', "aAb"),       # \xNN
        ('"\\u00e9"', "é"),    # \uNNNN
        ('"\\101"', "A"),           # 3-digit octal
        ('"bad\\q"', '"bad\\q"'),   # invalid escape -> unchanged
        ('"unterminated', '"unterminated'),
        ("`has`tick`", "`has`tick`"),  # backquote inside raw -> error
        (None, None),
    ]
    t = pa.table({"v": pa.array([c[0] for c in cases], pa.string())})
    out = unquote("v")(t)
    assert out["v"].to_pylist() == [c[1] for c in cases]


def test_unquote_hex_escapes_are_bytes():
    """Review fix: Go \\xNN escapes append RAW BYTES — a UTF-8 pair like
    \\xc3\\xa9 decodes to one 'é', not two Latin-1 mojibake chars."""
    from opentelemetry_collector_contrib_ray.stages.transform import (
        _go_unquote, unquote)
    assert _go_unquote('"\\xc3\\xa9"') == "é"
    t = pa.table({"v": pa.array(['"caf\\xc3\\xa9"'], pa.string())})
    assert unquote("v")(t)["v"].to_pylist() == ["café"]


def test_semconv_log_rename_onto_existing_column_no_duplicates():
    """Review fix: renaming onto an existing column name must drop the
    stale pre-existing column (pcommon rename overwrites), never emit a
    duplicate field."""
    from opentelemetry_collector_contrib_ray.stages.schema import (
        semconv_log_transform)
    versions = {"1.1.0": {"all": {"changes": [{"rename_attributes": {
        "attribute_map": {"old": "name"}}}]}}}
    t = pa.table({"old": ["a"], "name": ["stale"], "x": [1]})
    out = semconv_log_transform(versions, "1.0.0", "1.1.0")(t)
    assert out.column_names == ["name", "x"]
    assert out["name"].to_pylist() == ["a"]


def test_semconv_rename_metrics_single_map_lookup():
    # a rename map {'a':'b','b':'c'} in ONE changeset is a single lookup
    # per metric (Go map), not chained passes: 'a' -> 'b', 'b' -> 'c'.
    from opentelemetry_collector_contrib_ray.stages.schema import (
        parse_schema_file, semconv_metric_transform)
    versions = parse_schema_file("""
file_format: 1.0.0
schema_url: https://example.com/1.1.0
versions:
  1.1.0:
    metrics:
      changes:
      - rename_metrics:
          a: b
          b: c
  1.0.0: {}
""")
    t = pa.table({"metric_name": pa.array(["a", "b"]),
                  "value": pa.array([1.0, 2.0])})
    out = semconv_metric_transform(versions, "1.0.0", "1.1.0")(t)
    assert out["metric_name"].to_pylist() == ["b", "c"]


def test_probability_to_threshold_reference_examples():
    # pkg/sampling probability_test.go Example outputs, replayed exactly
    from opentelemetry_collector_contrib_ray.stages.transform import (
        probability_to_threshold, threshold_tvalue, tvalue_to_threshold)
    assert [threshold_tvalue(probability_to_threshold(d / 3.0, 3))
            for d in (1, 2, 3)] == ["aab", "555", "0"]
    assert threshold_tvalue(probability_to_threshold(1.0 / 3.0, 0)) \
        == "aaaaaaaaaaaaac"
    # tvalue roundtrip with trailing-zero omission
    assert tvalue_to_threshold("8") == 1 << 55
    assert threshold_tvalue(1 << 55) == "8"
    assert tvalue_to_threshold("") == 1 << 56            # never sample
    assert threshold_tvalue(0) == "0"                    # always sample
    # proportional underflow -> never sample (probability.go range error)
    assert probability_to_threshold(2.0 ** -60, 4) == 1 << 56


def test_consistent_sampler_modes(ray_session):
    import numpy as np
    import hashlib
    from opentelemetry_collector_contrib_ray.stages.transform import (
        consistent_sampler, tvalue_to_threshold, probability_to_threshold)
    n = 4000
    hexes = [hashlib.md5(str(i).encode()).hexdigest() for i in range(n)]
    th = [None, "8", "c", ""][0:1] * n  # start all-None
    t = pa.table({
        "k": pa.array(hexes),
        "th": pa.array([["8", "c", None, None][i % 4] for i in range(n)],
                       pa.string()),
    })
    # equalizing 50%: None/'8' rows -> '8'; 'c' rows keep 'c'
    out = consistent_sampler(50.0, "equalizing", "k",
                             threshold_col="th")(t)
    got = dict(zip(out["th"].to_pylist(),
                   out["sampling_threshold"].to_pylist()))
    assert got["8"] == "8" and got["c"] == "c" and got[None] == "8"
    # sampled iff T <= R, exact per-row check
    R = np.array([int(h[18:32], 16) for h in hexes], np.uint64)
    t_cfg = probability_to_threshold(0.5, 4)
    exp = []
    for i in range(n):
        tin = ["8", "c", None, None][i % 4]
        T = max(tvalue_to_threshold(tin), t_cfg) if tin else t_cfg
        exp.append(T <= R[i])
    assert out.num_rows == sum(exp)
    # proportional 50%: '8' -> 'c', 'c' -> 'e', None -> '8'
    out2 = consistent_sampler(50.0, "proportional", "k",
                              threshold_col="th")(t)
    got2 = dict(zip(out2["th"].to_pylist(),
                    out2["sampling_threshold"].to_pylist()))
    assert got2["8"] == "c" and got2["c"] == "e" and got2[None] == "8"
