"""OTTL e2e-style conformance over the canonical fixture (FIXTURES.md F2 —
mirror of pkg/ottl/e2e/e2e_test.go's single-record corpus): statement cases
applied to the one-row table, exact expected outputs."""

import datetime

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.functions import maps as M
from opentelemetry_collector_contrib_ray.functions import ottl


def fixture() -> pa.Table:
    """The F2 canonical log record as a one-row flat table with map/list
    columns for the open attributes."""
    attrs = pa.array([[("http.method", "get"), ("http.path", "/health"),
                       ("http.url", "http://localhost/health"),
                       ("flags", "A|B|C"), ("total.string", "123456789")]],
                     pa.map_(pa.string(), pa.string()))
    things = pa.array([[{"name": "foo", "value": 2},
                        {"name": "bar", "value": 5}]],
                      pa.list_(pa.struct([("name", pa.string()),
                                          ("value", pa.int64())])))
    foo = pa.array([{"bar": "pass", "flags": "pass", "nested": {"test": "pass"}}],
                   pa.struct([("bar", pa.string()), ("flags", pa.string()),
                              ("nested", pa.struct([("test", pa.string())]))]))
    return pa.table({
        "body": pa.array(["operationA"]),
        "ts": pa.array([datetime.datetime(2020, 2, 11, 20, 26, 12, 321)],
                       pa.timestamp("us")),
        "severity_number": pa.array([1], pa.int32()),
        "attributes": attrs,
        "things": things,
        "foo": foo,
    })


def _attrs_dict(tbl_or_arr):
    arr = tbl_or_arr["attributes"] if isinstance(tbl_or_arr, pa.Table) \
        else tbl_or_arr
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return dict(arr.to_pylist()[0])


def test_keep_keys():
    out = M.keep_keys(fixture()["attributes"], ["http.method", "http.path"])
    assert dict(out.to_pylist()[0]) == {"http.method": "get",
                                        "http.path": "/health"}


def test_delete_key_and_matching():
    a = fixture()["attributes"]
    assert "flags" not in dict(M.delete_key(a, "flags").to_pylist()[0])
    out = M.delete_matching_keys(a, r"^http\.")
    assert set(dict(out.to_pylist()[0])) == {"flags", "total.string"}
    out2 = M.keep_matching_keys(a, r"^http\.")
    assert set(dict(out2.to_pylist()[0])) == {"http.method", "http.path",
                                              "http.url"}


def test_limit_and_get_set():
    a = fixture()["attributes"]
    assert len(M.limit_map(a, 2).to_pylist()[0]) == 2
    assert M.map_get(a, "http.method").to_pylist() == ["get"]
    assert M.map_get(a, "missing").to_pylist() == [None]
    s = M.map_set(a, "http.method", "post")
    assert dict(s.to_pylist()[0])["http.method"] == "post"
    s2 = M.map_set(a, "new.key", "v")
    assert dict(s2.to_pylist()[0])["new.key"] == "v"
    assert len(s2.to_pylist()[0]) == 6


def test_merge_maps():
    a = fixture()["attributes"]
    src = pa.array([[("http.method", "POST"), ("extra", "1")]],
                   pa.map_(pa.string(), pa.string()))
    out = dict(M.merge_maps(a, src).to_pylist()[0])
    assert out["http.method"] == "POST" and out["extra"] == "1"
    assert out["flags"] == "A|B|C"


def test_to_key_value_string():
    a = pa.array([[("k1", "v1"), ("k2", "v2")], None],
                 pa.map_(pa.string(), pa.string()))
    assert M.to_key_value_string(a).to_pylist() == ["k1=v1 k2=v2", None]


def test_slice_to_map():
    lst = pa.array([["a", "b", "c"], ["x"]], pa.list_(pa.string()))
    out = M.slice_to_map(lst, ["first", "second"])
    assert dict(out.to_pylist()[0]) == {"first": "a", "second": "b"}
    assert dict(out.to_pylist()[1]) == {"first": "x"}


def test_flatten_struct_and_conflicts():
    t = fixture()
    out = M.flatten_struct(t, "foo", prefix="foo.")
    assert out["foo.bar"].to_pylist() == ["pass"]
    assert "foo" not in out.column_names
    # conflict handling (editors variant, e2e_test.go:1680+)
    t2 = t.append_column("foo2", t["foo"])
    t2 = M.flatten_struct(t2, "foo", prefix="")
    with pytest.raises(ValueError, match="conflict"):
        M.flatten_struct(t2, "foo2", prefix="")
    resolved = M.flatten_struct(t2, "foo2", prefix="", resolve_conflicts=True)
    assert "bar.0" in resolved.column_names


def test_e2e_statement_cases():
    """A block of e2e statement cases: editor over fixture -> expected."""
    t = fixture()
    # set(attributes["test"], "pass")
    out = M.map_set(t["attributes"], "test", "pass")
    assert dict(out.to_pylist()[0])["test"] == "pass"
    # set(body, ConvertCase(body, "upper"))
    assert ottl.to_upper_case(t["body"]).to_pylist() == ["OPERATIONA"]
    # replace_pattern(attributes["http.url"], "/health", "/healthz")
    url = M.map_get(t["attributes"], "http.url")
    assert ottl.replace_pattern(url, "/health$", "/healthz").to_pylist() == \
        ["http://localhost/healthz"]
    # Split(attributes["flags"], "|")
    assert ottl.split(M.map_get(t["attributes"], "flags"), "|") \
        .to_pylist() == [["A", "B", "C"]]
    # Substring(attributes["total.string"], 3, 3)
    assert ottl.substring(M.map_get(t["attributes"], "total.string"), 3, 3) \
        .to_pylist() == ["456"]
    # truncate_all(attributes, 100) -> no-op on short values; limit entries
    assert len(M.limit_map(t["attributes"], 100).to_pylist()[0]) == 5
    # things[1].value == 5 via list+struct access
    things = t["things"].combine_chunks() if isinstance(
        t["things"], pa.ChunkedArray) else t["things"]
    import pyarrow.compute as pc
    second = pc.list_element(things, 1)
    assert pc.struct_field(second, "value").to_pylist() == [5]


def test_e2e_statement_cases_block2():
    """Second block of e2e-style statements over the F2 fixture — editors
    combined with conditions (the `editor(...) where <expr>` shape)."""
    import pyarrow.compute as pc

    from opentelemetry_collector_contrib_ray.expr import col
    from opentelemetry_collector_contrib_ray.stages import transform as tr

    t = fixture()
    # set(body, "pass") where body == "operationA"
    out = tr.add("body", value="pass", where=col("body") == "operationA")(t)
    assert out["body"].to_pylist() == ["pass"]
    # set(body, "pass") where body == "operationB" -> unchanged
    out = tr.add("body", value="pass", where=col("body") == "operationB")(t)
    assert out["body"].to_pylist() == ["operationA"]
    # delete_key(attributes, "http.url") where severity_number == 1
    masked = M.delete_key(t["attributes"], "http.url")
    assert "http.url" not in dict(masked.to_pylist()[0])
    # keep_keys + to_key_value_string chain
    kept = M.keep_keys(t["attributes"], ["http.method", "http.path"])
    assert M.to_key_value_string(kept).to_pylist() == \
        ["http.method=get http.path=/health"]
    # IsMatch(attributes["http.url"], "http://.*") -> true
    url = M.map_get(t["attributes"], "http.url")
    assert ottl.is_match(url, r"http://.*").to_pylist() == [True]
    # set(attributes["test"], Concat([attributes["http.method"], body], "-"))
    method = M.map_get(t["attributes"], "http.method")
    joined = ottl.concat("-", method, t["body"].combine_chunks()
                         if hasattr(t["body"], "combine_chunks")
                         else t["body"])
    assert joined.to_pylist() == ["get-operationA"]
    # SHA256(attributes["http.method"]) prefix check (e2e hash cases)
    import hashlib as hl
    assert ottl.sha256(method).to_pylist()[0] == \
        hl.sha256(b"get").hexdigest()
    # Int(attributes["total.string"]) -> 123456789
    total = M.map_get(t["attributes"], "total.string")
    assert ottl.to_int(total).to_pylist() == [123456789]
    # Substring + Len + truncate_all combination
    assert ottl.str_len(total).to_pylist() == [9]
    assert ottl.truncate_all(total, 3).to_pylist() == ["123"]
    # Time/unix family over the fixture ts
    assert ottl.year(t["ts"]).to_pylist() == [2020]
    assert ottl.unix_seconds(t["ts"]).to_pylist() == [1581452772]
    # severity gate via expr mask (filterprocessor shape)
    keep = (col("severity_number") >= 1).mask(t)
    assert t.filter(keep).num_rows == 1
    keep0 = (col("severity_number") > 1).mask(t)
    assert t.filter(keep0).num_rows == 0
    # attributes flags split -> slice_to_map positional keys
    flags = ottl.split(M.map_get(t["attributes"], "flags"), "|")
    stm = M.slice_to_map(flags, ["f0", "f1"])
    assert dict(stm.to_pylist()[0]) == {"f0": "A", "f1": "B"}
    # things list length (Len on list column via value_length)
    things = t["things"].combine_chunks() if hasattr(
        t["things"], "combine_chunks") else t["things"]
    assert pc.list_value_length(things).to_pylist() == [2]
    # nested struct access foo.nested.test == "pass"
    foo = t["foo"].combine_chunks() if hasattr(t["foo"], "combine_chunks") \
        else t["foo"]
    nested = pc.struct_field(foo, "nested")
    assert pc.struct_field(nested, "test").to_pylist() == ["pass"]


def test_map_kernels_on_sliced_arrays():
    """Regression: sliced map arrays expose ABSOLUTE offsets over FULL
    children — kernels must rebase or they read neighboring rows."""
    m = pa.array([[("a", "1"), ("b", "2")], [("a", "3")],
                  [("c", "4"), ("a", "5")]],
                 pa.map_(pa.string(), pa.string()))
    s = m.slice(1)
    assert M.map_get(s, "a").to_pylist() == ["3", "5"]
    assert M.keep_keys(s, ["a"]).to_pylist() == \
        [[("a", "3")], [("a", "5")]]
    assert M.delete_key(s, "a").to_pylist() == [[], [("c", "4")]]
    out = M.map_set(s, "z", "9")
    assert dict(out.to_pylist()[0]) == {"a": "3", "z": "9"}

    lst = pa.array([[1, 2], [3], [4, 5]], pa.list_(pa.int64()))
    assert ottl.list_append(lst.slice(1), 9).to_pylist() == \
        [[3, 9], [4, 5, 9]]
