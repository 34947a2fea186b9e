"""Parser-stage unit tests (stanza parser semantics, SURVEY.md §2.3)."""

import pyarrow as pa
import pytest

from opentelemetry_collector_contrib_ray import model
from opentelemetry_collector_contrib_ray.stages.parse import (
    csv_parser,
    keyvalue_parser,
    map_severity_tokens,
    parse_transcript_batch,
    regex_parser,
    severity_parser,
    time_parser,
)


def _t(texts, **extra):
    cols = {"text": pa.array(texts, pa.string())}
    cols.update({k: pa.array(v) for k, v in extra.items()})
    return pa.table(cols)


def test_parse_transcript_templates():
    t = _t([
        '203.0.113.7 - alice [11/Feb/2026:20:26:12 +0000] '
        '"GET /api/v1/items?q=3 HTTP/1.1" 500 1534',
        'level=warn code=E1042 latency_ms=83 msg="tool call failed" tool=bash',
        '{"severity":"ERROR","error":{"code":"E7","retryable":false},'
        '"dur":"1.2s","spans":[1,2]}',
        '<34>1 2026-01-11T22:14:15.003Z host app 1234 ID47 - tool=search rc=0',
        'Traceback (most recent call last):',
        '  File "app.py", line 5, in run_step',
        'no structured content here',
    ])
    t = t.append_column("conv_id", pa.array(["c"] * 7))
    out = parse_transcript_batch(t)
    assert out["template"].to_pylist() == [
        "apache", "kv", "json", "syslog", "traceback", "traceback_cont",
        "plain"]
    # severity: 5xx -> ERROR(17); warn -> 13; ERROR -> 17; pri 34&7=2 ->
    # crit=ERROR2(18); traceback -> 17; cont/plain -> 0
    assert out["severity_number"].to_pylist() == [17, 13, 17, 18, 17, 0, 0]
    assert out["severity_text"].to_pylist() == [
        "error", "warn", "error", "crit", "error", "", ""]
    assert out["http_status"].to_pylist()[0] == 500
    assert out["error_code"].to_pylist()[1:3] == ["E1042", "E7"]
    assert out["latency_ms"].to_pylist()[1] == 83
    assert out["tool_attr"].to_pylist()[1] == "bash"
    assert out["tool_attr"].to_pylist()[3] == "search"
    assert out["syslog_pri"].to_pylist()[3] == 34


def test_severity_token_mapping():
    # default preset incl. warning/err aliases (severity_builder.go:73-86)
    toks = pa.array(["WARN", "warning", "err", "error3", "info", "bogus", None])
    got = map_severity_tokens(toks).to_pylist()
    assert got == [model.WARN, model.WARN, model.ERROR, model.ERROR3,
                   model.INFO, None, None]


def test_regex_parser_on_error_modes():
    t = _t(["x=1", "nope"])
    send = regex_parser(r"^x=(?P<val>\d+)$", prefix="p_")(t)
    assert send["p_val"].to_pylist() == ["1", None]
    drop = regex_parser(r"^x=(?P<val>\d+)$", prefix="p_", on_error="drop")(t)
    assert drop.num_rows == 1 and drop["p_val"].to_pylist() == ["1"]


def test_keyvalue_parser_vectorized_and_rowwise():
    t = _t(['a=1 b="two words" c=3', "a=9"])
    vec = keyvalue_parser(keys=["a", "b"])(t)
    assert vec["attr_a"].to_pylist() == ["1", "9"]
    assert vec["attr_b"].to_pylist() == ["two words", None]
    row = keyvalue_parser()(t)
    assert row["attr_a"].to_pylist() == ["1", "9"]
    assert row["attr_c"].to_pylist() == ["3", None]


def test_csv_parser():
    t = _t(["a,b,c", "1,2,3"])
    out = csv_parser(header=["x", "y", "z"])(t)
    assert out["y"].to_pylist() == ["b", "2"]


def test_severity_parser_custom_mapping():
    t = _t(["oops", "fine"])
    out = severity_parser("text", mapping={"oops": model.ERROR2})(t)
    assert out["severity_number"].to_pylist() == [model.ERROR2, 0]
    assert out["severity_text"].to_pylist() == ["error2", "default"]


def test_time_parser_strptime_and_epoch():
    t = _t(["2026-02-11 20:26:12", "not a time"])
    out = time_parser("text", "%Y-%m-%d %H:%M:%S")(t)
    vals = out["ts_parsed"].to_pylist()
    assert vals[0].year == 2026 and vals[1] is None

    t2 = pa.table({"e": pa.array([1_700_000_000])})
    out2 = time_parser("e", "s", layout_type="epoch")(t2)
    assert out2["ts_parsed"].to_pylist()[0].year == 2023


def test_syslog_rfc3164():
    from opentelemetry_collector_contrib_ray.stages.parse import (
        syslog_rfc3164_parser,
    )
    t = _t(["<34>Jan 11 22:14:15 myhost app[123]: something failed",
            "<13>Feb  3 01:02:03 h2 cron: run", "nope"])
    out = syslog_rfc3164_parser()(t)
    assert out["syslog_host"].to_pylist() == ["myhost", "h2", None]
    assert out["syslog_app"].to_pylist()[:2] == ["app", "cron"]
    # pri 34 -> facility 4, sev idx 2 -> crit(ERROR2=18); 13 -> notice(10)
    assert out["severity_number"].to_pylist() == [18, 10, 0]
    assert out["severity_text"].to_pylist() == ["crit", "notice", ""]
    assert out["syslog_facility"].to_pylist() == [4, 1, None]


def test_csv_parser_ragged_rows_all_null():
    # a row whose field count != header count errors in the reference
    # (parseutils.MapCSVHeaders csv.go:73-76) -> every parsed field null
    # for THAT row only; the batch itself must not fail (ADVICE r1)
    from opentelemetry_collector_contrib_ray.stages.parse import csv_parser

    fn = csv_parser(header=["a", "b", "c"])
    out = fn(pa.table({"text": ["1,2,3", "1,2", "", "x,y,z,extra"]}))
    assert out["a"].to_pylist() == ["1", None, None, None]
    assert out["b"].to_pylist() == ["2", None, None, None]
    assert out["c"].to_pylist() == ["3", None, None, None]


def test_jsonarray_parser():
    from opentelemetry_collector_contrib_ray.stages.parse import (
        jsonarray_parser,
    )

    t = pa.table({"text": ['["a",1,true]', '["b"]', None]})
    out = jsonarray_parser(header=["x", "y", "z"])(t)
    # parser.go:88-89: array length must equal header length, else the
    # row errors -> all parsed fields null (the '["b"]' row)
    assert out["x"].to_pylist() == ["a", None, None]
    assert out["y"].to_pylist() == ["1", None, None]
    assert out["z"].to_pylist() == ["true", None, None]


def test_trace_parser_hex_best_effort():
    from opentelemetry_collector_contrib_ray.stages.parse import trace_parser

    t = pa.table({
        "trace_id": ["0102030405060708090a0b0c0d0e0f10", "not-hex", None],
        "span_id": ["0102030405060708"] * 3,
        "trace_flags": ["01", "00", "ff"],
    })
    out = trace_parser()(t)
    assert out["trace_id"].to_pylist()[0] == bytes(range(1, 17))
    assert out["trace_id"].to_pylist()[1] is None  # invalid hex -> null
    assert out["span_id"].to_pylist()[0] == bytes(range(1, 9))
    assert out["trace_flags"].to_pylist() == [1, 0, 255]


def test_scope_parser():
    from opentelemetry_collector_contrib_ray.stages.parse import scope_parser

    t = pa.table({"logger": ["my.lib", None]})
    out = scope_parser("logger")(t)
    assert out["scope_name"].to_pylist() == ["my.lib", None]


def test_severity_parser_http_range_sugar():
    from opentelemetry_collector_contrib_ray.stages.parse import (
        severity_parser,
    )

    t = pa.table({"tok": ["200", "299", "301", "404", "503", "999"]})
    fn = severity_parser("tok", mapping={"2xx": 9, "3xx": 10,
                                         "4xx": 13, "5xx": 17})
    out = fn(t)
    assert out["severity_number"].to_pylist() == [9, 9, 10, 13, 17, 0]
    assert out["severity_text"].to_pylist() == \
        ["info", "info", "info2", "warn", "error", "default"]


def test_severity_parser_tuple_ranges():
    from opentelemetry_collector_contrib_ray.stages.parse import (
        severity_parser,
    )

    fn = severity_parser("tok", mapping={(250, 252): 21})
    out = fn(pa.table({"tok": ["250", "252", "253"]}))
    assert out["severity_number"].to_pylist() == [21, 21, 0]


def test_parse_transcript_6xx_status_passes_through():
    t = pa.table({"text": [
        '1.2.3.4 - bob [x] "GET /a HTTP/1.1" 605 12',
        '1.2.3.4 - bob [x] "GET /a HTTP/1.1" 200 12',
    ]})
    from opentelemetry_collector_contrib_ray.stages.parse import (
        parse_transcript_batch,
    )

    out = parse_transcript_batch(t)
    assert out["template"].to_pylist() == ["apache", "apache"]
    assert out["severity_number"].to_pylist() == [0, 9]  # 6xx: no severity


def test_keyvalue_parser_custom_pair_delimiter_and_metachars():
    from opentelemetry_collector_contrib_ray.stages.parse import (
        keyvalue_parser,
    )

    fn = keyvalue_parser(keys=["k", "other"], pair_delimiter="|")
    out = fn(pa.table({"text": ["risk=5|k=7|other=1"]}))
    assert out["attr_k"].to_pylist() == ["7"]      # not risk=5's tail
    assert out["attr_other"].to_pylist() == ["1"]


def test_jsonarray_parser_malformed_rows_null():
    from opentelemetry_collector_contrib_ray.stages.parse import (
        jsonarray_parser,
    )

    out = jsonarray_parser(header=["a"])(
        pa.table({"text": ['["x"]', "not json", None]}))
    assert out["a"].to_pylist() == ["x", None, None]


def test_rfc3164_preserves_existing_severity_on_unmatched():
    from opentelemetry_collector_contrib_ray.stages.parse import (
        syslog_rfc3164_parser,
    )

    t = pa.table({
        "text": ["<13>Oct 11 22:14:15 h app: msg", "plain line"],
        "severity_number": pa.array([9, 17], pa.int32()),
        "severity_text": ["info", "error"],
    })
    out = syslog_rfc3164_parser()(t)
    assert out["severity_number"].to_pylist()[1] == 17  # untouched
    assert out["severity_text"].to_pylist()[1] == "error"


def test_keyvalue_dynamic_key_collides_with_pivot_index():
    """A log key literally named '_i' (the pivot's index column) must not
    abort the parse stage — key names are format/attacker controlled."""
    from opentelemetry_collector_contrib_ray.stages.parse import (
        keyvalue_parser)
    fn = keyvalue_parser()
    out = fn(pa.table({"text": ["_i=5 a=1", "b=2 a=3"]}))
    assert out["attr__i"].to_pylist() == ["5", None]
    assert out["attr_a"].to_pylist() == ["1", "3"]
    assert out["attr_b"].to_pylist() == [None, "2"]


# ---------------------------------------------------------------------------
# Reference case replay — pkg/stanza/operator/parser/keyvalue/parser_test.go
# TestParser, transcribed to the batch model (flat columns instead of the
# ParseFrom/ParseTo field plumbing).
# ---------------------------------------------------------------------------

def _kv_dyn(text, **kw):
    from opentelemetry_collector_contrib_ray.stages.parse import (
        keyvalue_parser)
    out = keyvalue_parser(**kw)(pa.table({"text": [text]}))
    return {c[len("attr_"):]: out[c].to_pylist()[0]
            for c in out.column_names if c.startswith("attr_")
            and out[c].to_pylist()[0] is not None}


def test_ref_kv_simple():
    assert _kv_dyn("name=stanza age=2") == {"name": "stanza", "age": "2"}


def test_ref_kv_user_agent():
    ua = ("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:40.0) "
          "Gecko/20100101 Firefox/40.0")
    assert _kv_dyn(f'requestClientApplication="{ua}"') == {
        "requestClientApplication": ua}


def test_ref_kv_quotes_removed():
    assert _kv_dyn('name="stanza" age=2') == {"name": "stanza", "age": "2"}
    assert _kv_dyn("description='stanza deployment number 5' x=y") == {
        "description": "stanza deployment number 5", "x": "y"}
    assert _kv_dyn('name=" stanza " age=2') == {"name": "stanza",
                                                "age": "2"}


def test_ref_kv_leading_and_trailing_space():
    assert _kv_dyn('" name "=" stanza " age=2') == {"name": "stanza",
                                                    "age": "2"}


def test_ref_kv_double_delimiter():
    assert _kv_dyn('name==" stanza " age==2     key==value',
                   delimiter="==") == {
        "name": "stanza", "age": "2", "key": "value"}


def test_ref_kv_pair_delimiter():
    assert _kv_dyn("name=stanza|age=2     | key=value",
                   pair_delimiter="|") == {
        "name": "stanza", "age": "2", "key": "value"}


def test_ref_kv_pair_delimiter_multiline():
    assert _kv_dyn("name=stanza^\nage=2^\nkey=value",
                   pair_delimiter="^\n") == {
        "name": "stanza", "age": "2", "key": "value"}


def test_ref_kv_large():
    body = ('name=stanza age=1 job="software engineering" '
            'location="grand rapids michigan" src="10.3.3.76" '
            "dst=172.217.0.10 protocol=udp sport=57112 dport=443 "
            "translated_src_ip=96.63.176.3 translated_port=57112")
    assert _kv_dyn(body) == {
        "age": "1", "dport": "443", "dst": "172.217.0.10",
        "job": "software engineering",
        "location": "grand rapids michigan", "name": "stanza",
        "protocol": "udp", "sport": "57112", "src": "10.3.3.76",
        "translated_port": "57112", "translated_src_ip": "96.63.176.3"}


def test_ref_kv_dell_sonic_wall_subset():
    body = ('id=LVM_Sonicwall sn=22255555 time="2021-09-22 16:30:31" '
            'msg="Web site hit" rule="6 (LAN->WAN)" '
            'Category="Information Technology/Computers" '
            'note="Policy: a0, Info: 888 " n=3412158')
    got = _kv_dyn(body)
    assert got["time"] == "2021-09-22 16:30:31"
    assert got["msg"] == "Web site hit"
    assert got["rule"] == "6 (LAN->WAN)"
    assert got["note"] == "Policy: a0, Info: 888"
    assert got["n"] == "3412158"


def test_ref_kv_unterminated_quote_row_unparsed():
    # parseutils: "never reached the end of a quoted value" errors the
    # entry; batch form leaves the row's columns null
    from opentelemetry_collector_contrib_ray.stages.parse import (
        keyvalue_parser)
    out = keyvalue_parser()(pa.table({"text": ['a="broken b=2',
                                               "c=3 d=4"]}))
    assert out["attr_c"].to_pylist() == [None, "3"]
    assert "attr_a" not in out.column_names


# ---------------------------------------------------------------------------
# Reference case replay — pkg/stanza/operator/parser/csv/parser_test.go,
# transcribed to the batch model.
# ---------------------------------------------------------------------------

def _csv_one(text, header, **kw):
    from opentelemetry_collector_contrib_ray.stages.parse import csv_parser
    out = csv_parser(header=header, **kw)(pa.table({"text": [text]}))
    return {h: out[h].to_pylist()[0] for h in header}


def test_ref_csv_basic():
    assert _csv_one("stanza,INFO,started agent", ["name", "sev", "msg"]) \
        == {"name": "stanza", "sev": "INFO", "msg": "started agent"}


def test_ref_csv_comma_in_quotes():
    # "comma in quotes": quoted field keeps its comma, quotes stripped
    assert _csv_one('stanza,"Evergreen,49508",555-5555,agent',
                    ["name", "address", "phone", "position"]) == {
        "name": "stanza", "address": "Evergreen,49508",
        "phone": "555-5555", "position": "agent"}


def test_ref_csv_tab_delimiter():
    assert _csv_one("stanza\tINFO\tstarted agent",
                    ["name", "sev", "msg"], delimiter="\t") == {
        "name": "stanza", "sev": "INFO", "msg": "started agent"}


def test_ref_csv_missing_field_errors_row():
    # MapCSVHeaders: wrong number of fields -> error -> row unparsed
    assert _csv_one("stanza,INFO", ["name", "sev", "msg"]) == {
        "name": None, "sev": None, "msg": None}


def test_ref_csv_embedded_newline_continuation():
    # csv.go:44-55: each subsequent reader line continues the previous
    # line's LAST field
    got = _csv_one('aa,b\nb,cc', ["A", "B", "C"])
    assert got == {"A": "aa", "B": "b\nb", "C": "cc"}


def test_ref_csv_quoted_newline():
    got = _csv_one('stanza,"multi\nline message",agent',
                   ["name", "msg", "role"])
    assert got == {"name": "stanza", "msg": "multi\nline message",
                   "role": "agent"}


def test_ref_csv_ignore_quotes():
    # generateSplitParseFunc: plain split, quotes kept literal
    assert _csv_one('stanza,"quoted field",x', ["a", "b", "c"],
                    ignore_quotes=True) == {
        "a": "stanza", "b": '"quoted field"', "c": "x"}


def test_ref_csv_dynamic_fields_header_attribute():
    # "dynamic-fields": per-row headers from another column
    from opentelemetry_collector_contrib_ray.stages.parse import csv_parser
    t = pa.table({"text": ["stanza,1", "otel,2,extra"],
                  "hdr": ["name,age", "name,age,note"]})
    out = csv_parser(header_col="hdr")(t)
    assert out["name"].to_pylist() == ["stanza", "otel"]
    assert out["age"].to_pylist() == ["1", "2"]
    assert out["note"].to_pylist() == [None, "extra"]


def test_ref_csv_dynamic_fields_header_delimiter():
    from opentelemetry_collector_contrib_ray.stages.parse import csv_parser
    t = pa.table({"text": ["stanza,1"], "hdr": ["name|age"]})
    out = csv_parser(header_col="hdr", header_delimiter="|")(t)
    assert out["name"].to_pylist() == ["stanza"]
    assert out["age"].to_pylist() == ["1"]


def test_keyvalue_keyed_last_wins_and_quote_safe():
    """Review findings: the keyed path must return the LAST occurrence of
    a repeated key (parseutils map overwrite) and must not read a key
    token inside another key's quoted value."""
    t = pa.table({"text": ['msg="x tool=hammer" tool=axe', "k=a k=b",
                           None]})
    out = keyvalue_parser(keys=["tool", "msg", "k"])(t)
    assert out["attr_tool"].to_pylist() == ["axe", None, None]
    assert out["attr_msg"].to_pylist() == ["x tool=hammer", None, None]
    assert out["attr_k"].to_pylist() == [None, "b", None]


def test_json_parser_all_rows_malformed():
    """The malformed-row rescue path must survive a batch where EVERY row
    is invalid (review finding: all-None list inferred dtype Null and the
    rescue itself raised SchemaError)."""
    from opentelemetry_collector_contrib_ray.stages.parse import json_parser
    t = pa.table({"text": ["not json", "{bad", None]})
    out = json_parser()(t)
    assert out["parsed"].to_pylist() == [None, None, None]


def test_syslog_pri_over_191_is_unparsed():
    """RFC PRI max is 191 (facility 23); larger values must leave the row
    unparsed like the reference, not yield bogus facility/severity."""
    from opentelemetry_collector_contrib_ray.stages.parse import (
        syslog_rfc3164_parser)
    t = pa.table({"text": [
        "<999>Jan  1 00:00:00 h app[1]: msg",
        "<188>Jan  1 00:00:00 h app[1]: msg"]})
    out = syslog_rfc3164_parser()(t)
    assert out["syslog_pri"].to_pylist() == [None, 188]


# ---------------------------------------------------------------------------
# Reference case replay — pkg/stanza/operator/helper/severity_test.go
# TestSeverityParser, transcribed to the batch model (reference mapping
# shape + overwrite_text semantics).
# ---------------------------------------------------------------------------

_ALL_THE_THINGS = {
    "info": "3xx",
    "error3": {"min": 200, "max": 299},
    "debug4": "100",
    "trace2": ["ttttttracer", {"min": 1111, "max": 1234}],
    "12": "infooo",
    "fatal2": "",
}

SEVERITY_REF_CASES = [
    # (name, sample, mapping, expected_num, expected_text, overwrite)
    ("unknown", "blah", None, 0, "blah", False),
    ("error", "error", None, 17, "error", False),
    ("error-overwrite-text", "error", None, 17, "ERROR", True),
    ("error2", "error2", None, 18, "error2", False),
    ("error3", "error3", None, 19, "error3", False),
    ("error4", "error4", None, 20, "error4", False),
    ("error-capitalized", "Error", None, 17, "Error", False),
    ("error-capitalized-overwrite", "Error", None, 17, "ERROR", True),
    ("error-all-caps", "ERROR", None, 17, "ERROR", False),
    ("custom-string", "NOOOOOOO", {"error": "NOOOOOOO"}, 17, "NOOOOOOO",
     False),
    ("custom-string-overwrite", "NOOOOOOO", {"error": "NOOOOOOO"}, 17,
     "ERROR", True),
    ("custom-string-caps-key", "NOOOOOOO", {"ErRoR": "NOOOOOOO"}, 17,
     "NOOOOOOO", False),
    ("custom-int", 1234, {"error": 1234}, 17, "1234", False),
    ("mixed-list-string", "ThiS Is BaD",
     {"error": ["NOOOOOOO", "this is bad", 1234]}, 17, "ThiS Is BaD",
     False),
    ("custom-float64", 6.0, {"error": 6}, 17, "6", False),
    ("mixed-list-int", 1234,
     {"error": ["NOOOOOOO", "this is bad", 1234]}, 17, "1234", False),
    ("numbered-level", "critical", {"error2": "critical"}, 18, "critical",
     False),
    ("numbered-level-overwrite", "critical", {"error2": "critical"}, 18,
     "ERROR2", True),
    ("override-standard", "error", {"error3": ["error"]}, 19, "error",
     False),
    ("level-unfound", "not-in-the-list-but-thats-ok",
     {"error4": ["hey!", 1234]}, 0, "not-in-the-list-but-thats-ok", False),
    ("in-range", 123, {"error": {"min": 120, "max": 125}}, 17, "123",
     False),
    ("in-range-overwrite", 123, {"error": {"min": 120, "max": 125}}, 17,
     "ERROR", True),
    ("in-range-min", 120, {"error": {"min": 120, "max": 125}}, 17, "120",
     False),
    ("in-range-max", 125, {"error": {"min": 120, "max": 125}}, 17, "125",
     False),
    ("out-of-range-min-minus", 119, {"error": {"min": 120, "max": 125}},
     0, "119", False),
    ("out-of-range-max-plus", 126, {"error": {"min": 120, "max": 125}},
     0, "126", False),
    ("range-out-of-order", 123, {"error": {"min": 125, "max": 120}}, 17,
     "123", False),
    ("Http2xx-hit", 201, {"error": "2xx"}, 17, "201", False),
    ("Http2xx-miss", 301, {"error": "2xx"}, 0, "301", False),
    ("Http3xx-hit", 301, {"error": "3xx"}, 17, "301", False),
    ("Http4xx-hit", "404", {"error": "4xx"}, 17, "404", False),
    ("Http5xx-hit", 555, {"error": "5xx"}, 17, "555", False),
    ("Http-All", "301",
     {"debug": "2xx", "info": "3xx", "error": "4xx", "warn": "5xx"},
     9, "301", False),
    ("Http-All-overwrite", "301",
     {"debug": "2xx", "info": "3xx", "error": "4xx", "warn": "5xx"},
     9, "INFO", True),
    ("all-the-things-midrange", 1234, _ALL_THE_THINGS, 2, "1234", False),
    ("all-the-things-empty", "", _ALL_THE_THINGS, 22, "", False),
    ("all-the-things-3xx", "399", _ALL_THE_THINGS, 9, "399", False),
    ("all-the-things-miss", "miss", _ALL_THE_THINGS, 0, "miss", False),
]


@pytest.mark.parametrize(
    "name,sample,mapping,want_num,want_text,overwrite",
    SEVERITY_REF_CASES, ids=[c[0] for c in SEVERITY_REF_CASES])
def test_severity_parser_reference_cases(name, sample, mapping, want_num,
                                         want_text, overwrite):
    from opentelemetry_collector_contrib_ray.stages.parse import (
        severity_parser)
    t = pa.table({"tok": pa.array([sample])})
    out = severity_parser("tok", mapping=mapping,
                          mapping_shape="reference",
                          overwrite_text=overwrite)(t)
    assert out["severity_number"].to_pylist() == [want_num], name
    assert out["severity_text"].to_pylist() == [want_text], name


# ---------------------------------------------------------------------------
# Reference case replay — pkg/stanza/operator/helper/time_test.go
# TestTimeEpochs (epoch layouts; engine timestamp precision is us, so ns
# cases truncate to us like the reference's maxLoss allowance).
# ---------------------------------------------------------------------------

EPOCH_REF_CASES = [
    # (name, sample, layout, expected_us_since_epoch)
    ("s-string", "1136214245", "s", 1136214245_000000),
    ("s-int", 1136214245, "s", 1136214245_000000),
    ("s-float", 1136214245.0, "s", 1136214245_000000),
    ("ms-string", "1136214245123", "ms", 1136214245_123000),
    ("ms-int", 1136214245123, "ms", 1136214245_123000),
    ("ms-float", 1136214245123.0, "ms", 1136214245_123000),
    ("us-string", "1136214245123456", "us", 1136214245_123456),
    ("us-int", 1136214245123456, "us", 1136214245_123456),
    ("us-float", 1136214245123456.0, "us", 1136214245_123456),
    ("ns-string", "1136214245123456789", "ns", 1136214245_123456),
    ("ns-int", 1136214245123456789, "ns", 1136214245_123456),
    ("s.ms-string", "1136214245.123", "s.ms", 1136214245_123000),
    ("s.ms-int", 1136214245, "s.ms", 1136214245_000000),
    ("s.ms-float", 1136214245.123, "s.ms", 1136214245_123000),
    ("s.us-string", "1136214245.123456", "s.us", 1136214245_123456),
    ("s.us-int", 1136214245, "s.us", 1136214245_000000),
    ("s.us-float", 1136214245.123456, "s.us", 1136214245_123456),
    ("s.ns-string", "1136214245.123456789", "s.ns", 1136214245_123457),
    ("s.ns-int", 1136214245, "s.ns", 1136214245_000000),
    ("s.ns-float", 1136214245.123456789, "s.ns", 1136214245_123457),
]


@pytest.mark.parametrize("name,sample,layout,want_us", EPOCH_REF_CASES,
                         ids=[c[0] for c in EPOCH_REF_CASES])
def test_time_parser_epoch_reference_cases(name, sample, layout, want_us):
    from opentelemetry_collector_contrib_ray.stages.parse import time_parser
    t = pa.table({"v": pa.array([sample])})
    out = time_parser("v", layout, layout_type="epoch")(t)
    got = out["ts_parsed"].cast(pa.int64()).to_pylist()[0]
    assert got == want_us, (name, got, want_us)
