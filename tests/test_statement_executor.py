"""transformprocessor statement-group executor: reference e2e corpus replay.

Statements below are transcribed VERBATIM from pkg/ottl/e2e/e2e_test.go
(the reference's densest behavioral spec, 177 cases); expected outcomes are
the `want` bodies translated to the flat-table model. Flat-model
divergences (typed map values stringified, nested values JSON-encoded) are
documented in DIVERGENCES.md.
"""

import datetime
import hashlib
import json

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.pipelines.statements import (
    StatementGroupExecutor,
    transform_processor,
)


def fixture() -> pa.Table:
    """The e2e canonical log record (e2e_test.go constructTransformContext)
    as a one-row flat table."""
    attrs = pa.array([[("http.method", "get"), ("http.path", "/health"),
                       ("http.url", "http://localhost/health"),
                       ("flags", "A|B|C"), ("total.string", "123456789")]],
                     pa.map_(pa.string(), pa.string()))
    res = pa.array([[("host.name", "localhost")]],
                   pa.map_(pa.string(), pa.string()))
    return pa.table({
        "body": pa.array(["operationA"]),
        "ts": pa.array([datetime.datetime(2020, 2, 11, 20, 26, 12, 321)],
                       pa.timestamp("us")),
        "severity_number": pa.array([1], pa.int32()),
        "severity_text": pa.array([""]),
        "attributes": attrs,
        "resource": res,
    })


def run1(statement: str, conditions=None, error_mode="propagate") -> pa.Table:
    fn = transform_processor([{
        "context": "log", "conditions": conditions or [],
        "statements": [statement], "error_mode": error_mode,
    }])
    return fn(fixture())


def attrs_of(t: pa.Table) -> dict:
    a = t["attributes"]
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    return dict(a.to_pylist()[0])


BASE = {"http.method": "get", "http.path": "/health",
        "http.url": "http://localhost/health", "flags": "A|B|C",
        "total.string": "123456789"}


def _merged(**kv):
    d = dict(BASE)
    d.update(kv)
    return d


# (statement, expected-attributes dict or checker(table))
E2E_CASES = [
    # --- editors (e2e_test.go Test_e2e_editors) ---
    ('delete_key(attributes, "http.method")',
     {k: v for k, v in BASE.items() if k != "http.method"}),
    ('delete_matching_keys(attributes, "^http")',
     {"flags": "A|B|C", "total.string": "123456789"}),
    ('keep_matching_keys(attributes, "^http")',
     {k: v for k, v in BASE.items() if k.startswith("http")}),
    ('keep_keys(attributes, ["flags", "total.string"])',
     {"flags": "A|B|C", "total.string": "123456789"}),
    ('limit(attributes, 100, [])', BASE),
    ('limit(attributes, 1, ["total.string"])',
     {"total.string": "123456789"}),
    ('replace_all_matches(attributes, "*/*", "test")',
     _merged(**{"http.path": "test", "http.url": "test"})),
    ('replace_all_patterns(attributes, "key", "^http", "test")',
     {"test.method": "get", "test.path": "/health",
      "test.url": "http://localhost/health", "flags": "A|B|C",
      "total.string": "123456789"}),
    ('replace_all_patterns(attributes, "value", "/", "@")',
     _merged(**{"http.path": "@health",
                "http.url": "http:@@localhost@health"})),
    ('replace_match(attributes["http.path"], "*/*", "test")',
     _merged(**{"http.path": "test"})),
    ('replace_pattern(attributes["http.path"], "/", "@")',
     _merged(**{"http.path": "@health"})),
    ('set(attributes["test"], "pass")', _merged(test="pass")),
    ('set(attributes["test"], nil)', BASE),
    ('set(attributes["test"], attributes["unknown"])', BASE),
    ('truncate_all(attributes, 100)', BASE),
    ('truncate_all(attributes, 1)',
     {"http.method": "g", "http.path": "/", "http.url": "h",
      "flags": "A", "total.string": "1"}),
    # --- converters (Test_e2e_converters) ---
    ('set(attributes["test"], Base64Decode("cGFzcw=="))',
     _merged(test="pass")),
    ('set(attributes["test"], Decode("cGFzcw==", "base64"))',
     _merged(test="pass")),
    ('set(attributes["test"], {"list":[{"foo":"bar"}]})',
     lambda t: json.loads(attrs_of(t)["test"]) == {"list": [{"foo": "bar"}]}),
    ('set(attributes["test"], IsList([1, 2]))', _merged(test="true")),
    ('set(attributes["test"], Len([1, 2, 3]))', _merged(test="3")),
    ('set(attributes["test"], String(true))', _merged(test="true")),
    ('set(attributes["test"], ParseCSV("val1,val2,val3","header1|header2|header3",headerDelimiter="|",mode="strict"))',
     lambda t: json.loads(attrs_of(t)["test"]) == {
         "header1": "val1", "header2": "val2", "header3": "val3"}),
    ('set(attributes["test"], "\\\\\\\\")', _merged(test="\\\\")),
    ('set(attributes["test"], Concat(["A","B"], ":"))', _merged(test="A:B")),
    ('set(attributes["test"], ConvertCase(attributes["http.method"], "upper"))',
     _merged(test="GET")),
    ('set(attributes["test"], ConvertCase("PASS", "lower"))',
     _merged(test="pass")),
    ('set(attributes["test"], ConvertCase("fooBar", "snake"))',
     _merged(test="foo_bar")),
    ('set(attributes["test"], ConvertCase("foo_bar", "camel"))',
     _merged(test="FooBar")),
    ('set(attributes["test"], ToCamelCase("foo_bar"))',
     _merged(test="FooBar")),
    ('set(attributes["test"], ToSnakeCase("fooBar"))',
     _merged(test="foo_bar")),
    ('set(attributes["test"], ToUpperCase(attributes["http.method"]))',
     _merged(test="GET")),
    ('set(attributes["test"], ToLowerCase("PASS"))', _merged(test="pass")),
    ('set(attributes["test"], "pass") where Time("10", "%M") - Time("01", "%M") < Duration("10m")',
     _merged(test="pass")),
    ('set(attributes["test"], ExtractPatterns("aa123bb", "(?P<numbers>\\\\d+)"))',
     lambda t: json.loads(attrs_of(t)["test"]) == {"numbers": "123"}),
    ('set(attributes["test"], FNV("pass"))',
     _merged(test="266877920130663416")),
    ('set(attributes["test"], Format("%03d-%s", [7, "test"]))',
     _merged(test="007-test")),
    ('set(attributes["test"], Hour(Time("12", "%H")))', _merged(test="12")),
    ('set(attributes["test"], Hours(Duration("90m")))',
     lambda t: float(attrs_of(t)["test"]) == 1.5),
    ('set(attributes["test"], InsertXML("<a></a>", "/a", "<b></b>"))',
     _merged(test="<a><b></b></a>")),
    ('set(attributes["test"], Int(1.0))', _merged(test="1")),
    ('set(attributes["test"], Int("1"))', _merged(test="1")),
    ('set(attributes["test"], Int(true))', _merged(test="1")),
    ('set(attributes["test"], Int(1))', _merged(test="1")),
    ('set(attributes["test"], GetXML("<a><b>1</b><c><b>2</b></c></a>", "/a//b"))',
     _merged(test="<b>1</b><b>2</b>")),
    ('set(attributes["test"], Hex(1.0))', _merged(test="3ff0000000000000")),
    ('set(attributes["test"], Hex(true))', _merged(test="01")),
    ('set(attributes["test"], Hex(12))', _merged(test="000000000000000c")),
    ('set(attributes["test"], Hex("12"))', _merged(test="3132")),
    ('set(attributes["test"], "pass") where IsBool(false)',
     _merged(test="pass")),
    ('set(attributes["test"], "pass") where IsDouble(1.0)',
     _merged(test="pass")),
    ('set(attributes["test"], "pass") where IsMatch("aa123bb", "\\\\d{3}")',
     _merged(test="pass")),
    ('set(attributes["test"], "pass") where IsString("")',
     _merged(test="pass")),
    ('set(attributes["test"], Log(1))',
     lambda t: float(attrs_of(t)["test"]) == 0.0),
    ('set(attributes["test"], MD5("pass"))',
     _merged(test=hashlib.md5(b"pass").hexdigest())),
    ('set(attributes["test"], Microseconds(Duration("1ms")))',
     _merged(test="1000")),
    ('set(attributes["test"], Milliseconds(Duration("1s")))',
     _merged(test="1000")),
    ('set(attributes["test"], Minutes(Duration("1h")))',
     lambda t: float(attrs_of(t)["test"]) == 60.0),
    ('set(attributes["test"], Murmur3Hash128("Hello World"))',
     _merged(test="dbc2a0c1ab26631a27b4c09fcf1fe683")),
    ('set(attributes["test"], Murmur3Hash("Hello World"))',
     _merged(test="ce837619")),
    ('set(attributes["test"], Nanoseconds(Duration("1ms")))',
     _merged(test="1000000")),
    ('set(attributes["test"], "pass") where Now() - Now() < Duration("1h")',
     _merged(test="pass")),
    ('set(attributes["test"], ParseCSV("val1;val2;val3","header1|header2|header3",";","|","strict"))',
     lambda t: json.loads(attrs_of(t)["test"]) == {
         "header1": "val1", "header2": "val2", "header3": "val3"}),
    ('set(attributes["test"], ParseJSON("{\\"id\\":1}"))',
     lambda t: json.loads(attrs_of(t)["test"]) == {"id": "1"}),
    ('set(attributes["test"], ParseKeyValue("k1=v1 k2=v2"))',
     lambda t: json.loads(attrs_of(t)["test"]) == {"k1": "v1", "k2": "v2"}),
    ('set(attributes["test"], ParseKeyValue("k1!v1_k2!v2", "!", "_"))',
     lambda t: json.loads(attrs_of(t)["test"]) == {"k1": "v1", "k2": "v2"}),
    ('set(attributes["test"], ToKeyValueString(ParseKeyValue("k1=v1 k2=v2"), "=", " ", true))',
     _merged(test="k1=v1 k2=v2")),
    ('set(attributes["test"], Seconds(Duration("1m")))',
     lambda t: float(attrs_of(t)["test"]) == 60.0),
    ('set(attributes["test"], SHA1("pass"))',
     _merged(test=hashlib.sha1(b"pass").hexdigest())),
    ('set(attributes["test"], SHA256("pass"))',
     _merged(test=hashlib.sha256(b"pass").hexdigest())),
    ('set(attributes["test"], SHA512("pass"))',
     _merged(test=hashlib.sha512(b"pass").hexdigest())),
    ('set(attributes["test"], Sort(Split(attributes["flags"], "|"), "desc"))',
     lambda t: json.loads(attrs_of(t)["test"]) == ["C", "B", "A"]),
    ('set(attributes["test"], Sort([3, 6, 9], "desc"))',
     lambda t: json.loads(attrs_of(t)["test"]) == [9, 6, 3]),
    ('set(attributes["test"], Split(attributes["flags"], "|"))',
     lambda t: json.loads(attrs_of(t)["test"]) == ["A", "B", "C"]),
    ('set(attributes["test"], String("test"))', _merged(test="test")),
    ('set(attributes["test"], Substring("pass", 0, 2))', _merged(test="pa")),
    ('set(attributes["time"], FormatTime(time, "%Y-%m-%d"))',
     _merged(time="2020-02-11")),
    ('set(attributes["test"], "pass") where UnixMicro(time) > 0',
     _merged(test="pass")),
    ('set(attributes["test"], "pass") where UnixMilli(time) > 0',
     _merged(test="pass")),
    ('set(attributes["test"], "pass") where UnixNano(time) > 0',
     _merged(test="pass")),
    ('set(attributes["test"], "pass") where UnixSeconds(time) > 0',
     _merged(test="pass")),
    ('set(attributes["test"], "pass") where IsString(UUID())',
     _merged(test="pass")),
    ('set(attributes["test"], "\\\\")', _merged(test="\\")),
    ('set(attributes["test"], "\\"")', _merged(test='"')),
    ('set(attributes["test"], UserAgent("curl/7.81.0"))',
     lambda t: json.loads(attrs_of(t)["test"])["name"] == "curl" and
     json.loads(attrs_of(t)["test"])["version"] == "7.81.0"),
    # --- where clauses (Test_e2e_ottl) ---
    ('set(attributes["test"], "pass") where body == "operationB"', BASE),
    ('set(attributes["test"], "pass") where resource.attributes["host.name"] == "localhost"',
     _merged(test="pass")),
    ('set(severity_number, SEVERITY_NUMBER_TRACE2) where severity_number == SEVERITY_NUMBER_TRACE',
     lambda t: t["severity_number"].to_pylist() == [2]),
    ('set(attributes["test"], "pass") where IsMatch(body, "operation[AC]")',
     _merged(test="pass")),
    ('set(attributes["test"], "pass") where body == Concat(["operation", "A"], "")',
     _merged(test="pass")),
    ('merge_maps(attributes, ParseJSON("{\\"json_test\\":\\"pass\\"}"), "insert") where body == "operationA"',
     _merged(json_test="pass")),
    ('set(attributes["my.environment.2"], Split(resource.attributes["host.name"],"h")[1])',
     _merged(**{"my.environment.2": "ost"})),
]


@pytest.mark.parametrize("statement,expected",
                         E2E_CASES, ids=[c[0][:70] for c in E2E_CASES])
def test_e2e_replay(statement, expected):
    out = run1(statement)
    if callable(expected):
        assert expected(out), f"checker failed for {statement}"
    else:
        assert attrs_of(out) == expected


# --- executor semantics beyond single statements ---------------------------

def test_group_conditions_gate_all_statements():
    fn = transform_processor([{
        "context": "log",
        "conditions": ['body == "operationZ"', 'severity_number == 99'],
        "statements": ['set(attributes["test"], "x")', 'set(body, "y")'],
    }])
    out = fn(fixture())
    assert attrs_of(out) == BASE and out["body"].to_pylist() == ["operationA"]


def test_group_conditions_or_semantics():
    fn = transform_processor([{
        "context": "log",
        "conditions": ['body == "operationZ"', 'severity_number == 1'],
        "statements": ['set(attributes["test"], "x")'],
    }])
    assert attrs_of(fn(fixture()))["test"] == "x"


def test_groups_run_in_order_and_see_prior_edits():
    fn = transform_processor([
        {"statements": ['set(attributes["a"], "1")']},
        {"statements": ['set(attributes["b"], attributes["a"])']},
    ])
    a = attrs_of(fn(fixture()))
    assert a["a"] == "1" and a["b"] == "1"


def test_statements_chain_within_group():
    fn = transform_processor([{
        "statements": [
            'set(body, ConvertCase(body, "upper"))',
            'set(attributes["test"], body)',
        ],
    }])
    out = fn(fixture())
    assert attrs_of(out)["test"] == "OPERATIONA"


def test_error_mode_propagate_raises():
    with pytest.raises(ValueError, match="unknown OTTL function"):
        run1('set(attributes["test"], NoSuchFn(body))')


def test_error_mode_ignore_and_silent_skip_statement():
    for mode in ("ignore", "silent"):
        fn = transform_processor([{
            "error_mode": mode,
            "statements": [
                'set(attributes["test"], NoSuchFn(body))',
                'set(attributes["ok"], "yes")',
            ],
        }])
        a = attrs_of(fn(fixture()))
        assert "test" not in a and a["ok"] == "yes"


def test_cache_scratch_is_group_scoped_and_dropped():
    fn = transform_processor([{
        "statements": [
            'set(cache["tmp"], ConvertCase(body, "upper"))',
            'set(attributes["from_cache"], cache["tmp"])',
        ],
    }])
    out = fn(fixture())
    assert attrs_of(out)["from_cache"] == "OPERATIONA"
    assert all("cache" not in c for c in out.column_names)


def test_masked_set_multirow():
    t = pa.table({
        "body": pa.array(["operationA", "operationB", "operationA"]),
        "attributes": pa.array([[("k", "v")], [], None],
                               pa.map_(pa.string(), pa.string())),
    })
    fn = transform_processor([{
        "statements": ['set(attributes["hit"], "1") where body == "operationA"'],
    }])
    out = fn(t)
    rows = out["attributes"].to_pylist()
    assert dict(rows[0]).get("hit") == "1"
    assert dict(rows[1] or []).get("hit") is None
    assert dict(rows[2] or []).get("hit") == "1"  # null map: set creates


def test_executor_validates_error_mode():
    with pytest.raises(ValueError, match="bad error_mode"):
        StatementGroupExecutor([{"error_mode": "explode", "statements": []}])


DYNAMIC_CASES = [
    # e2e_test.go:408 — dynamic map key from another attribute's value
    ('set(attributes[attributes["flags"]], "something33")',
     _merged(**{"A|B|C": "something33"})),
    # e2e_test.go:1236 — dynamic key in a where clause (key absent -> nil)
    ('set(attributes["foo"], "bar") where attributes[attributes["flags"]] != nil',
     BASE),
    # dynamic key on the resource map
    ('set(resource.attributes[attributes["flags"]], "x")',
     lambda t: dict(t["resource"].to_pylist()[0])["A|B|C"] == "x"),
]


@pytest.mark.parametrize("statement,expected", DYNAMIC_CASES,
                         ids=[c[0][:60] for c in DYNAMIC_CASES])
def test_dynamic_map_keys(statement, expected):
    out = run1(statement)
    if callable(expected):
        assert expected(out)
    else:
        assert attrs_of(out) == expected


def test_dynamic_key_write_then_read_chain():
    fn = transform_processor([{
        "statements": [
            'set(attributes[attributes["flags"]], "something33")',
            'set(attributes["foo"], "bar") where attributes[attributes["flags"]] != nil',
        ],
    }])
    a = attrs_of(fn(fixture()))
    assert a["A|B|C"] == "something33" and a["foo"] == "bar"


def test_resource_context_group():
    """context: resource — bare attributes paths address the resource map
    (transformprocessor ContextStatements context semantics)."""
    fn = transform_processor([{
        "context": "resource",
        "conditions": ['attributes["host.name"] == "localhost"'],
        "statements": ['set(attributes["env"], "prod")'],
    }])
    out = fn(fixture())
    res = dict(out["resource"].to_pylist()[0])
    assert res["env"] == "prod"
    assert "env" not in attrs_of(out)  # log attributes untouched


def test_bad_context_rejected():
    with pytest.raises(ValueError, match="bad context"):
        StatementGroupExecutor([{"context": "span", "statements": []}])


def test_dynamic_set_creates_missing_map_column():
    t = pa.table({"body": ["operationA"], "k": ["newkey"]})
    fn = transform_processor([{"statements": ['set(attrs2[k], "v")']}])
    out = fn(t)
    assert dict(out["attrs2"].to_pylist()[0]) == {"newkey": "v"}


def test_dynamic_set_json_encodes_nested_values():
    out = run1('set(attributes[attributes["flags"]], ParseJSON("{\\"a\\":1}"))')
    assert json.loads(attrs_of(out)["A|B|C"]) == {"a": "1"}


def test_dynamic_key_rejected_outside_set():
    with pytest.raises(ValueError, match="only supported by `set`"):
        run1('replace_pattern(attributes[attributes["flags"]], "l", "L")')


def test_scope_context_attributes_do_not_hit_log_attributes():
    fn = transform_processor([{
        "context": "scope",
        "statements": ['set(attributes["k"], "v")'],
    }])
    out = fn(fixture())
    assert "k" not in attrs_of(out)  # scope attrs are not the log attrs


def test_scalar_int_division_truncates_like_ottl():
    out = run1('set(attributes["d"], 6 / 4)')
    assert attrs_of(out)["d"] == "1"          # int/int truncates (math.go)
    out = run1('set(attributes["d"], 6.0 / 4)')
    assert attrs_of(out)["d"] == "1.5"


def test_replace_all_patterns_mode_validated():
    with pytest.raises(ValueError, match="mode must be"):
        run1('replace_all_patterns(attributes, "Key", "^http", "x")')


def test_instrumentation_scope_name_path():
    t = fixture().append_column("scope_name", pa.array(["my.lib"]))
    fn = transform_processor([{
        "statements": ['set(attributes["s"], instrumentation_scope.name)'],
    }])
    assert attrs_of(fn(t))["s"] == "my.lib"


def test_empty_batch_through_executor():
    empty = pa.table({
        "body": pa.array([], pa.string()),
        "attributes": pa.array([], pa.map_(pa.string(), pa.string())),
    })
    fn = transform_processor([{
        "conditions": ['body == "x"'],
        "statements": ['set(attributes["k"], "v")',
                       'delete_key(attributes, "x")',
                       'set(body, "z") where body == "a"'],
    }])
    out = fn(empty)
    assert out.num_rows == 0
    assert set(out.column_names) == {"body", "attributes"}


def test_parser_binary_minus_without_spaces():
    """Regression: '-1' after a value is a binary minus, not a second
    argument (e2e: attributes["things"][Len(attributes["things"]) - 1])."""
    out = run1('set(attributes["d"], Len(attributes["flags"])-1)')
    assert attrs_of(out)["d"] == "4"  # len("A|B|C") == 5
    with pytest.raises(ValueError, match="expected ','"):
        run1('set(attributes["d"], 1 2)')
