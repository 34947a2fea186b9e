"""OTTL function-library conformance tests — mirrors the shape of the
reference's e2e statement corpus (pkg/ottl/e2e/e2e_test.go, SURVEY.md §5.3):
each case = (function application, expected output) over a canonical fixture.
"""

import datetime
import hashlib

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.functions import ottl

S = pa.array(["operationA", "Hello World", "snake_case_str", None])
TS = pa.array([datetime.datetime(2020, 2, 11, 20, 26, 12, 321)], pa.timestamp("us"))


def test_case_conversions():
    assert ottl.to_upper_case(S).to_pylist() == [
        "OPERATIONA", "HELLO WORLD", "SNAKE_CASE_STR", None]
    assert ottl.to_lower_case(S).to_pylist()[0] == "operationa"
    assert ottl.to_snake_case(pa.array(["fooBarBaz", "Hello World"])) \
        .to_pylist() == ["foo_bar_baz", "hello_world"]
    assert ottl.to_camel_case(pa.array(["foo_bar", "hello world"])) \
        .to_pylist() == ["FooBar", "HelloWorld"]
    assert ottl.convert_case(pa.array(["aB"]), "snake").to_pylist() == ["a_b"]


def test_string_functions():
    assert ottl.trim(pa.array(["  x  "])).to_pylist() == ["x"]
    assert ottl.split(pa.array(["a,b,c"]), ",").to_pylist() == [["a", "b", "c"]]
    assert ottl.substring(pa.array(["abcdef"]), 1, 3).to_pylist() == ["bcd"]
    assert ottl.concat("-", pa.array(["a", None]), pa.array(["b", "c"])) \
        .to_pylist() == ["a-b", "-c"]
    assert ottl.str_len(S).to_pylist() == [10, 11, 14, None]
    assert ottl.truncate_all(pa.array(["abcdef"]), 3).to_pylist() == ["abc"]
    assert ottl.format_str("%s=%d", [pa.array(["x"]), pa.array([7])]) \
        .to_pylist() == ["x=7"]


def test_replace_functions():
    assert ottl.replace_pattern(
        pa.array(["id=123"]), r"id=(\d+)", "num=$$1").to_pylist() == ["num=123"]
    assert ottl.replace_match(
        pa.array(["hello world", "nope"]), "hello*", "greeting") \
        .to_pylist() == ["greeting", "nope"]
    assert ottl.is_match(pa.array(["operationA"]), "^op").to_pylist() == [True]


def test_hash_functions():
    assert ottl.md5(pa.array(["x"])).to_pylist()[0] == \
        hashlib.md5(b"x").hexdigest()
    assert ottl.sha256(pa.array(["x", None])).to_pylist() == [
        hashlib.sha256(b"x").hexdigest(), None]
    # FNV-1a 64 reference vector, as int64 two's complement (Go cast)
    got = ottl.fnv(pa.array(["foobar"])).to_pylist()[0]
    assert got == (0x85944171f73967e8 - (1 << 64))
    assert ottl.hex_encode(pa.array(["AB"])).to_pylist() == ["4142"]
    u = ottl.deterministic_uuid(pa.array(["a", "a", "b"])).to_pylist()
    assert u[0] == u[1] != u[2]
    assert len(ottl.uuid_v4(3)) == 3


def test_base64():
    assert ottl.base64_decode(pa.array(["aGVsbG8="])).to_pylist() == ["hello"]
    assert ottl.base64_encode(pa.array(["hello"])).to_pylist() == ["aGVsbG8="]


def test_time_functions():
    t = ottl.time_parse(pa.array(["2020-02-11 20:26:12"]), "%Y-%m-%d %H:%M:%S")
    assert t.to_pylist()[0].hour == 20
    assert ottl.format_time(TS, "%Y-%m-%d").to_pylist() == ["2020-02-11"]
    assert ottl.truncate_time(TS, "hour").to_pylist()[0].minute == 0
    assert ottl.unix_seconds(TS).to_pylist()[0] == 1581452772
    assert ottl.unix_milli(TS).to_pylist()[0] == 1581452772000
    assert ottl.unix_micro(TS).to_pylist()[0] == 1581452772000321
    assert ottl.unix_nano(TS).to_pylist()[0] == 1581452772000321000
    assert ottl.year(TS).to_pylist() == [2020]
    assert ottl.month(TS).to_pylist() == [2]
    assert ottl.day(TS).to_pylist() == [11]
    assert ottl.hour(TS).to_pylist() == [20]
    assert ottl.minute(TS).to_pylist() == [26]
    assert ottl.second(TS).to_pylist() == [12]
    # 2020-02-11 is a Tuesday; Go Weekday: Sunday=0 -> 2
    assert ottl.weekday(TS).to_pylist() == [2]


def test_duration():
    got = ottl.duration_seconds(pa.array(["1.2s", "83ms", "2m", "bad"]))
    assert got.to_pylist()[:3] == pytest.approx([1.2, 0.083, 120.0])
    assert got.to_pylist()[3] is None


def test_duration_sign_rules():
    """Go ParseDuration: one optional LEADING sign only; interior signs
    ('1h-30m') are invalid; unitless '0' is valid."""
    assert ottl._duration_scalar("-1h30m") == pytest.approx(-5400.0)
    assert ottl._duration_scalar("+2s") == pytest.approx(2.0)
    assert ottl._duration_scalar("0") == 0.0
    assert ottl._duration_scalar("-0") == 0.0
    for bad in ("1h-30m", "1h+30m", "--1s", "+", "-", ""):
        with pytest.raises(ValueError):
            ottl._duration_scalar(bad)


def test_duration_int_components_truncate():
    """Go Duration.Milliseconds()/... integer-divide int64 ns (truncate
    toward zero): 1.5ms -> 1 ms, never 2; negative truncates toward 0."""
    d = pa.array([1.5e-3, 2e-3, 0.999e-3, -1.5e-3], pa.float64())
    assert ottl.dur_milliseconds(d).to_pylist() == [1, 2, 0, -1]
    assert ottl.dur_microseconds(pa.array([2.7e-6])).to_pylist() == [2]
    assert ottl.dur_milliseconds(1.5e-3) == 1
    assert ottl.dur_milliseconds(-1.5e-3) == -1
    # float components still divide exactly
    assert ottl.dur_hours(pa.array([5400.0])).to_pylist() == [1.5]


def test_type_conversions():
    assert ottl.to_int(pa.array(["12", "x"])).to_pylist() == [12, None]
    assert ottl.to_double(pa.array(["1.5"])).to_pylist() == [1.5]
    assert ottl.to_string(pa.array([1, 2])).to_pylist() == ["1", "2"]
    assert ottl.is_string(S) and not ottl.is_int(S)
    assert ottl.is_int(pa.array([1]))
    assert ottl.is_double(pa.array([1.0]))
    assert ottl.is_bool(pa.array([True]))
    assert ottl.is_list(pa.array([[1]]))


def test_url_parse():
    st = ottl.url_parse(pa.array(["http://localhost:8080/health?q=1#frag"]))
    assert st.is_valid()[0].as_py() if hasattr(st.is_valid()[0], 'as_py') else st.is_valid()[0]
    import pyarrow.compute as pc
    assert pc.struct_field(st, "scheme").to_pylist() == ["http"]
    assert pc.struct_field(st, "host").to_pylist() == ["localhost"]
    assert pc.struct_field(st, "port").to_pylist() == ["8080"]
    assert pc.struct_field(st, "path").to_pylist() == ["/health"]
    assert pc.struct_field(st, "query").to_pylist() == ["q=1"]


def test_useragent():
    ua = ottl.useragent_parse(pa.array([
        "Mozilla/5.0 Chrome/120.0.0.0 Safari/537.36",
        "curl/8.4.0", "weird-bot/1.0"]))
    import pyarrow.compute as pc
    assert pc.struct_field(ua, "name").to_pylist() == ["Chrome", "curl", "Other"]
    assert pc.struct_field(ua, "version").to_pylist()[:2] == ["120.0.0.0", "8.4.0"]


def test_registry_and_extension():
    assert "SHA256" in ottl.REGISTRY and callable(ottl.REGISTRY["SHA256"])
    assert len(ottl.REGISTRY) >= 45
    ottl.register("MyFunc", lambda c: c)
    assert "MyFunc" in ottl.REGISTRY


def test_list_append_and_sort():
    lst = pa.array([[1, 2], [], None], pa.list_(pa.int64()))
    out = ottl.list_append(lst, 9)
    assert out.to_pylist() == [[1, 2, 9], [9], [9]]
    s = ottl.list_sort(pa.array([[3, 1, 2], None], pa.list_(pa.int64())))
    assert s.to_pylist() == [[1, 2, 3], None]
    d = ottl.list_sort(pa.array([[3, 1]], pa.list_(pa.int64())), "desc")
    assert d.to_pylist() == [[3, 1]]


def test_parse_simplified_xml_and_get_xml():
    x = pa.array(["<a>1</a><b attr='z'>two</b>", "no xml", None])
    m = ottl.parse_simplified_xml(x)
    assert dict(m.to_pylist()[0]) == {"a": "1", "b": "two"}
    assert m.to_pylist()[1] == []
    assert m.to_pylist()[2] is None
    assert ottl.get_xml(x, "b").to_pylist() == ["two", None, None]


def test_registry_completeness():
    # every SURVEY §2.5 category has registry coverage
    for name in ["KeepKeys", "DeleteKey", "MergeMaps", "Flatten",
                 "ToKeyValueString", "SliceToMap", "Append", "SortList",
                 "ParseSimplifiedXML", "ParseJSON", "ParseCSV",
                 "ParseKeyValue", "SHA256", "Time", "Duration", "URL",
                 "UserAgent", "IsMatch", "ConvertCase"]:
        assert name in ottl.REGISTRY, name
    assert len(ottl.REGISTRY) >= 60


def test_log_fn():
    import math
    got = ottl.REGISTRY["Log"](pa.array([math.e, 1.0, 0.0, -3.0, None]))
    vals = got.to_pylist()
    assert vals[0] == pytest.approx(1.0) and vals[1] == 0.0
    assert vals[2] is None and vals[3] is None and vals[4] is None


def test_map_set_and_list_append_on_all_empty_children():
    # regression: zero-length child arrays crashed the dummy-take path
    from opentelemetry_collector_contrib_ray.functions import maps as m

    empty_maps = pa.array([[], [], None], pa.map_(pa.string(), pa.string()))
    out = m.map_set(empty_maps, "k", pa.array(["a", "b", "c"]))
    # null rows become single-entry maps: set always creates (PutStr)
    assert out.to_pylist() == [[("k", "a")], [("k", "b")], [("k", "c")]]
    assert m.map_get(empty_maps, "k").to_pylist() == [None, None, None]

    empty_lists = pa.array([[], []], pa.list_(pa.int64()))
    out2 = ottl.list_append(empty_lists, 7)
    assert out2.to_pylist() == [[7], [7]]


def test_hex_large_ints_exact():
    big = pa.array([9007199254740993, 2**63 - 1], pa.int64())
    assert ottl.hex_typed(big).to_pylist() == \
        ["0020000000000001", "7fffffffffffffff"]


def test_unix_downconvert_floors_pre_epoch():
    """Go's Unix()/UnixMilli()/UnixMicro() floor for pre-epoch instants
    (sec is the floored quotient, nsec non-negative) — not truncate."""
    a = pa.array([-500_000, 500_000, -1_500_000, 0], pa.timestamp("us"))
    assert ottl.unix_seconds(a).to_pylist() == [-1, 0, -2, 0]
    assert ottl.unix_milli(a).to_pylist() == [-500, 500, -1500, 0]
    assert ottl.unix_nano(a).to_pylist() == [
        -500_000_000, 500_000_000, -1_500_000_000, 0]


def test_to_key_value_string_quotes_keys_both_paths():
    """Keys containing a delimiter are quoted exactly like values, with
    and without sortKeys (func_to_key_value_string.go writer)."""
    from opentelemetry_collector_contrib_ray.functions import maps as m
    arr = pa.array([[("k 1", "v1"), ("k2", "v 2")]],
                   pa.map_(pa.string(), pa.string()))
    want = '"k 1"=v1 k2="v 2"'
    assert m.to_key_value_string(arr).to_pylist() == [want]
    assert m.to_key_value_string(arr, sort_keys=True).to_pylist() == [want]


def test_sub_second_components_normalize_units():
    """Nanosecond/Microsecond on ns- and ms-unit columns report the true
    within-second component (no us-unit assumption)."""
    ns = pa.array([1_500_000_123], pa.timestamp("ns"))  # 1.500000123 s
    assert ottl.nanosecond(ns).to_pylist() == [500_000_123]
    assert ottl.microsecond(ns).to_pylist() == [500_000]
    ms = pa.array([1500], pa.timestamp("ms"))
    assert ottl.nanosecond(ms).to_pylist() == [500_000_000]
    assert ottl.microsecond(ms).to_pylist() == [500_000]


def test_grok_optional_typed_captures_null_not_crash():
    """Non-participating optional groups surface as '' from Arrow; typed
    captures must null them, map entries must omit them (review
    findings)."""
    import pyarrow as pa
    from opentelemetry_collector_contrib_ray.functions.grok import (
        extract_grok_patterns)
    fn = extract_grok_patterns("%{ELB_URI}", parse_from="text")
    out = fn(pa.table({"text": ["https://example.com/path"]}))
    assert out["url.port"].to_pylist() == [None]  # typed, absent
    pats = ottl.REGISTRY["ExtractGrokPatterns"](
        pa.array(["https://example.com/path"]), "%{ELB_URI}")
    entries = dict(pats.to_pylist()[0])
    assert "url.port" not in entries and "url.query" not in entries


def test_go_float_encoding_1e15_to_1e21():
    from opentelemetry_collector_contrib_ray.functions.jsonpath import (
        encode_val)
    assert encode_val(1e15) == "1000000000000000"
    assert encode_val(1e16) == "10000000000000000"
    assert encode_val(1e21) == "1e+21"
    assert encode_val(1.0) == "1"


def test_json_get_static_raises_like_dyn_on_type_mismatch():
    import pyarrow as pa
    import pytest
    from opentelemetry_collector_contrib_ray.functions.jsonpath import (
        json_get, json_get_dyn)
    with pytest.raises(ValueError):
        json_get(pa.array(["[1,2,3]"]), ["a"])
    with pytest.raises(ValueError):
        json_get_dyn(pa.array(["[1,2,3]"]), ["a"])
    # genuinely missing keys stay null, no error
    assert json_get(pa.array(['{"x":1}']), ["y"]).to_pylist() == [None]


def test_map_set_updates_in_place_and_merge_presence():
    import pyarrow as pa
    from opentelemetry_collector_contrib_ray.functions import maps as M
    t = pa.array([[("k", None), ("o", "1")]],
                 pa.map_(pa.string(), pa.string()))
    s = pa.array([[("k", "S")]], pa.map_(pa.string(), pa.string()))
    # present-null entry: insert must NOT overwrite, update MUST
    assert M.merge_maps(t, s, "insert").to_pylist()[0] == \
        [("k", None), ("o", "1")]
    assert M.merge_maps(t, s, "update").to_pylist()[0] == \
        [("k", "S"), ("o", "1")]
    # in-place update preserves entry order
    assert M.map_set(t, "k", "X").to_pylist()[0] == \
        [("k", "X"), ("o", "1")]


def test_to_key_value_string_escapes_quotes():
    import pyarrow as pa
    from opentelemetry_collector_contrib_ray.functions import maps as M
    t = pa.array([[("k", 'he said "hi"')]],
                 pa.map_(pa.string(), pa.string()))
    assert M.to_key_value_string(t).to_pylist() == ['k="he said \\"hi\\""']


def test_format_only_literals_and_uuid_column_arg():
    import pyarrow as pa
    out = ottl.format_str("%s-%d", ["a", 1])
    assert out.to_pylist() == ["a-1"]
    u = ottl.uuid_v4(pa.array(["x", "y"]))
    assert len(u) == 2


def test_get_xml_escapes_tag_metacharacters():
    import pyarrow as pa
    out = ottl.get_xml(pa.array(["<axb>BAD</axb><a.b>GOOD</a.b>"]), "a.b")
    assert out.to_pylist() == ["GOOD"]
