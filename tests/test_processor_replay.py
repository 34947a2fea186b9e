"""transformprocessor logs processor_test.go replay (round-5 corpus growth).

Cases are transcribed VERBATIM from
processor/transformprocessor/internal/logs/processor_test.go
(Test_ProcessLogs_LogContext + InferredLogContext + Scope/Resource
contexts + CacheAccess): the TWO-record fixture (constructLogs,
processor_test.go:1234-1272) exercises the mask machinery the one-record
e2e corpus cannot (only record 1 carries dropped_attributes_count/flags/
severity/ids). Every log-context statement runs in BOTH spellings — bare
(`attributes[...]`) and context-prefixed (`log.attributes[...]`) — the
reference runs the same table twice the same way.

Flat-model divergences (typed map values stringified; slices JSON-encoded)
per DIVERGENCES.md.
"""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray.pipelines.statements import (
    transform_processor)

TRACE_ID = bytes(range(1, 17))
SPAN_ID = bytes(range(1, 9))
TS_NS = 1581452772000000321

BASE1 = {"http.method": "get", "http.path": "/health",
         "http.url": "http://localhost/health", "flags": "A|B|C",
         "total.string": "123456789"}
BASE2 = {"http.method": "get", "http.path": "/health",
         "http.url": "http://localhost/health", "flags": "C|D",
         "total.string": "345678"}


def logs_fixture() -> pa.Table:
    """constructLogs() flat-encoded: fillLogOne + fillLogTwo."""
    attrs = pa.array([list(BASE1.items()), list(BASE2.items())],
                     pa.map_(pa.string(), pa.string()))
    res = pa.array([[("host.name", "localhost")]] * 2,
                   pa.map_(pa.string(), pa.string()))
    scope_attrs = pa.array([[], []], pa.map_(pa.string(), pa.string()))
    return pa.table({
        "body": pa.array(["operationA", "operationB"]),
        "ts": pa.array([TS_NS] * 2, pa.timestamp("ns")),
        "dropped_attributes_count": pa.array([1, 0], pa.uint32()),
        "flags": pa.array([1, 0], pa.uint32()),
        "severity_number": pa.array([1, 0], pa.int32()),
        "severity_text": pa.array(["", ""]),
        "trace_id": pa.array([TRACE_ID, bytes(16)], pa.binary()),
        "span_id": pa.array([SPAN_ID, bytes(8)], pa.binary()),
        "attributes": attrs,
        "resource": res,
        "scope_name": pa.array(["scope"] * 2),
        "scope_attributes": scope_attrs,
        "scope_schema_url": pa.array(["test_schema_url"] * 2),
        "resource_schema_url": pa.array(["test_schema_url"] * 2),
    })


def run_log(statement: str, error_mode="ignore") -> pa.Table:
    fn = transform_processor([{"context": "log", "statements": [statement],
                               "error_mode": error_mode}])
    return fn(logs_fixture())


def attrs(t: pa.Table, row: int) -> dict:
    a = t["attributes"]
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    return dict(a.to_pylist()[row])


def col(t: pa.Table, name: str) -> list:
    c = t[name]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_pylist()


def _a(**extra):
    """(want_attrs_row0, want_attrs_row1) helpers."""
    return dict(BASE1, **extra), dict(BASE2)


def _both(**extra):
    return dict(BASE1, **extra), dict(BASE2, **extra)


# (statement, (want attrs row0, want attrs row1)) — None = unchanged check
# handled separately below
LOG_CASES = [
    ('set(attributes["test"], "pass") where body == "operationA"',
     _a(test="pass")),
    ('set(attributes["test"], "pass") where body == "operationB"',
     (dict(BASE1), dict(BASE2, test="pass"))),
    ('set(attributes["test"], "pass") '
     'where resource.attributes["host.name"] == "localhost"',
     _both(test="pass")),
    ('set(attributes["test"], "pass") '
     'where resource.attributes["host.name"] == "wrong"',
     (dict(BASE1), dict(BASE2))),
    ('keep_keys(attributes, ["http.method"]) where body == "operationA"',
     ({"http.method": "get"}, dict(BASE2))),
    ('replace_pattern(attributes["http.method"], "get", "post")',
     _both(**{"http.method": "post"})),
    ('replace_all_patterns(attributes, "value", "get", "post")',
     _both(**{"http.method": "post"})),
    ('replace_all_patterns(attributes, "key", "http.url", "url")',
     ({k if k != "http.url" else "url": v for k, v in BASE1.items()},
      {k if k != "http.url" else "url": v for k, v in BASE2.items()})),
    ('set(attributes["test"], "pass") where dropped_attributes_count == 1',
     _a(test="pass")),
    ('set(attributes["test"], "pass") where flags == 1',
     _a(test="pass")),
    ('set(attributes["test"], "pass") '
     'where severity_number == SEVERITY_NUMBER_TRACE',
     _a(test="pass")),
    ('set(attributes["test"], "pass") where trace_id == '
     'TraceID(0x0102030405060708090a0b0c0d0e0f10)',
     _a(test="pass")),
    ('set(attributes["test"], "pass") where span_id == '
     'SpanID(0x0102030405060708)',
     _a(test="pass")),
    ('set(attributes["test"], "pass") where IsMatch(body, "operation[AC]")',
     _a(test="pass")),
    ('delete_key(attributes, "http.url") where body == "operationA"',
     ({k: v for k, v in BASE1.items() if k != "http.url"}, dict(BASE2))),
    ('delete_matching_keys(attributes, "http.*t.*") '
     'where body == "operationA"',
     ({"http.url": "http://localhost/health", "flags": "A|B|C",
       "total.string": "123456789"}, dict(BASE2))),
    ('set(attributes["test"], Concat([attributes["http.method"], '
     'attributes["http.url"]], ": ")) '
     'where body == Concat(["operation", "A"], "")',
     _a(test="get: http://localhost/health")),
    ('set(attributes["test"], Split(attributes["flags"], "|"))',
     (dict(BASE1, test='["A","B","C"]'), dict(BASE2, test='["C","D"]'))),
    ('set(attributes["test"], Split(attributes["flags"], "|")) '
     'where body == "operationA"',
     _a(test='["A","B","C"]')),
    # Split/Substring on a missing attribute error per record ->
    # ignore mode leaves the batch unchanged (processor_test.go wants)
    ('set(attributes["test"], Split(attributes["not_exist"], "|"))',
     (dict(BASE1), dict(BASE2))),
    ('set(attributes["test"], Substring(attributes["total.string"], 3, 3))',
     (dict(BASE1, test="456"), dict(BASE2, test="678"))),
    ('set(attributes["test"], Substring(attributes["total.string"], 3, 3)) '
     'where body == "operationA"',
     _a(test="456")),
    ('set(attributes["test"], Substring(attributes["not_exist"], 3, 3))',
     (dict(BASE1), dict(BASE2))),
    ('set(attributes["test"], ["A", "B", "C"]) where body == "operationA"',
     _a(test='["A","B","C"]')),
    ('set(attributes["test"], ConvertCase(body, "lower")) '
     'where body == "operationA"',
     _a(test="operationa")),
    ('set(attributes["test"], ConvertCase(body, "upper")) '
     'where body == "operationA"',
     _a(test="OPERATIONA")),
    ('set(attributes["test"], ConvertCase(body, "snake")) '
     'where body == "operationA"',
     _a(test="operation_a")),
    ('set(attributes["test"], ConvertCase(body, "camel")) '
     'where body == "operationA"',
     _a(test="OperationA")),
    ('merge_maps(attributes, ParseJSON("{\\"json_test\\":\\"pass\\"}"), '
     '"insert") where body == "operationA"',
     _a(json_test="pass")),
    ('limit(attributes, 0, []) where body == "operationA"',
     ({}, dict(BASE2))),
    ('set(attributes["test"], Log(1)) where body == "operationA"',
     _a(test="0")),
    # scope attributes are empty in the fixture -> no row matches
    ('set(attributes["test"], "pass") '
     'where instrumentation_scope.attributes["test"] == "pass"',
     (dict(BASE1), dict(BASE2))),
]


def _prefixed(stmt: str) -> str:
    """The InferredLogContext spelling: every bare log path gains `log.`."""
    out = stmt
    for bare, pref in [("attributes[", "log.attributes["),
                       ("body", "log.body"),
                       ("severity_number", "log.severity_number"),
                       ("severity_text", "log.severity_text"),
                       ("dropped_attributes_count",
                        "log.dropped_attributes_count"),
                       ("trace_id", "log.trace_id"),
                       ("span_id", "log.span_id")]:
        out = out.replace(pref, "\x00")          # protect already-prefixed
        out = out.replace(bare, pref)
        out = out.replace("\x00", pref)
    # `where flags == 1` (record field), not the attribute value "A|B|C"
    out = out.replace("where flags ==", "where log.flags ==")
    # resource./instrumentation_scope. paths must keep their own prefix
    out = out.replace("resource.log.attributes", "resource.attributes")
    out = out.replace("instrumentation_scope.log.attributes",
                      "instrumentation_scope.attributes")
    return out


@pytest.mark.parametrize("statement,want", LOG_CASES,
                         ids=[c[0][:70] for c in LOG_CASES])
def test_log_context_replay(statement, want):
    out = run_log(statement)
    assert attrs(out, 0) == want[0], statement
    assert attrs(out, 1) == want[1], statement


@pytest.mark.parametrize("statement,want", LOG_CASES,
                         ids=["log." + c[0][:66] for c in LOG_CASES])
def test_inferred_log_context_replay(statement, want):
    out = run_log(_prefixed(statement))
    assert attrs(out, 0) == want[0], _prefixed(statement)
    assert attrs(out, 1) == want[1], _prefixed(statement)


def test_log_context_severity_and_text_edits():
    out = run_log('set(severity_text, "ok") '
                  'where attributes["http.path"] == "/health"')
    assert col(out, "severity_text") == ["ok", "ok"]
    out = run_log('set(severity_number, SEVERITY_NUMBER_TRACE2) '
                  'where severity_number == 1')
    assert col(out, "severity_number") == [2, 0]
    out = run_log('set(log.severity_number, SEVERITY_NUMBER_TRACE2) '
                  'where log.severity_number == 1')
    assert col(out, "severity_number") == [2, 0]


# --- resource / scope context groups (Test_ProcessLogs_*Context) ----------

def test_resource_context_replay():
    fn = transform_processor([{"context": "resource", "statements": [
        'set(attributes["test"], "pass")']}])
    out = fn(logs_fixture())
    assert dict(col(out, "resource")[0]) == {"host.name": "localhost",
                                             "test": "pass"}
    fn = transform_processor([{"context": "resource", "statements": [
        'set(attributes["test"], "pass") '
        'where attributes["host.name"] == "wrong"']}])
    out = fn(logs_fixture())
    assert dict(col(out, "resource")[0]) == {"host.name": "localhost"}
    fn = transform_processor([{"context": "resource", "statements": [
        'set(schema_url, "new_url")']}])
    out = fn(logs_fixture())
    assert col(out, "resource_schema_url") == ["new_url"] * 2
    assert col(out, "scope_schema_url") == ["test_schema_url"] * 2


def test_inferred_resource_context_replay():
    # the InferredResourceContext spelling inside a log group
    fn = transform_processor([{"context": "log", "statements": [
        'set(resource.attributes["test"], "pass")',
        'set(resource.schema_url, "new_url")']}])
    out = fn(logs_fixture())
    assert dict(col(out, "resource")[0]) == {"host.name": "localhost",
                                             "test": "pass"}
    assert col(out, "resource_schema_url") == ["new_url"] * 2


def test_scope_context_replay():
    fn = transform_processor([{"context": "scope", "statements": [
        'set(attributes["test"], "pass") where name == "scope"']}])
    out = fn(logs_fixture())
    assert dict(col(out, "scope_attributes")[0]) == {"test": "pass"}
    # version is unset in constructLogs -> no match
    fn = transform_processor([{"context": "scope", "statements": [
        'set(attributes["test"], "pass") where version == 2']}])
    out = fn(logs_fixture())
    assert dict(col(out, "scope_attributes")[0]) == {}
    fn = transform_processor([{"context": "scope", "statements": [
        'set(schema_url, "new_url")']}])
    out = fn(logs_fixture())
    assert col(out, "scope_schema_url") == ["new_url"] * 2
    assert col(out, "resource_schema_url") == ["test_schema_url"] * 2


def test_inferred_scope_context_replay():
    fn = transform_processor([{"context": "log", "statements": [
        'set(scope.attributes["test"], "pass") where scope.name == "scope"',
        'set(scope.schema_url, "new_url")']}])
    out = fn(logs_fixture())
    assert dict(col(out, "scope_attributes")[0]) == {"test": "pass"}
    assert col(out, "scope_schema_url") == ["new_url"] * 2


# --- cache semantics (Test_ProcessLogs_CacheAccess) ------------------------

def test_cache_within_group():
    fn = transform_processor([{"context": "log", "statements": [
        'set(cache["test"], "pass")',
        'set(attributes["test"], cache["test"])']}])
    out = fn(logs_fixture())
    assert attrs(out, 0)["test"] == "pass"
    assert attrs(out, 1)["test"] == "pass"


def test_cache_shared_across_groups():
    fn = transform_processor([
        {"context": "log", "shared_cache": True,
         "statements": ['set(log.cache["test"], "pass")']},
        {"context": "log", "shared_cache": True,
         "statements": ['set(log.attributes["test"], log.cache["test"])']},
    ])
    out = fn(logs_fixture())
    assert attrs(out, 0)["test"] == "pass"
    assert attrs(out, 1)["test"] == "pass"


def test_cache_isolation_replay():
    # processor_test.go 'cache isolation': unshared groups see neither the
    # shared store nor each other's caches; a nil cache read never writes
    fn = transform_processor([
        {"context": "log", "shared_cache": True,
         "statements": ['set(log.cache["shared"], "fail")']},
        {"context": "log", "statements": [
            'set(log.cache["test"], "pass")',
            'set(log.attributes["test"], log.cache["test"])',
            'set(log.attributes["test"], log.cache["shared"])']},
        {"context": "log", "statements": [
            'set(cache["test"], "pass")',
            'set(attributes["test"], cache["test"])',
            'set(attributes["test"], cache["shared"])',
            'set(attributes["test"], log.cache["shared"])']},
        {"context": "log", "shared_cache": True,
         "statements": ['set(log.attributes["test"], "pass") '
                        'where log.cache["shared"] == "fail"']},
    ])
    out = fn(logs_fixture())
    assert attrs(out, 0)["test"] == "pass"
    assert attrs(out, 1)["test"] == "pass"


def test_resource_cache_prefixed():
    fn = transform_processor([
        {"context": "resource", "shared_cache": True,
         "statements": ['set(resource.cache["test"], "pass")']},
        {"context": "resource", "shared_cache": True,
         "statements": ['set(resource.attributes["test"], '
                        'resource.cache["test"])']},
    ])
    out = fn(logs_fixture())
    assert dict(col(out, "resource")[0])["test"] == "pass"
