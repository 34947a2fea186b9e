"""Declarative filterprocessor matchers — the reference's filterlog test
tables replayed over Arrow batches.

Case sources:
  - TestLogRecord_Matching_False / _True:
    internal/filter/filterlog/filterlog_test.go:91-240 (severity numbers:
    Trace=1 Debug=5 Info=9 Error=17 per plog).
  - NewSkipExpr include-before-exclude:
    internal/filter/filterlog/filterlog.go:30-50.
  - attribute existence + value rules:
    internal/filter/filtermatcher/attributematcher.go:84-115.
  - severity undefined handling:
    internal/filter/filterlog/severity_matcher.go:24-35.
"""

import pyarrow as pa
import pytest
import ray

from opentelemetry_collector_contrib_ray.stages.filtermatch import (
    AttributeMatch, MatchProperties, compile_match, filter_logs, skip_expr)


def _one_row(**cols) -> pa.Table:
    return pa.table({k: [v] for k, v in cols.items()})


# filterlog_test.go:139-141 — the record the False/True tables run on
LR = dict(text="AUTHENTICATION FAILED", severity_text="debug",
          severity_number=5, abc="def")

FALSE_CASES = [
    ("attributes_dont_match",
     MatchProperties("regexp", attributes=[AttributeMatch("abc", "def2")])),
    ("attributes_key_missing",
     MatchProperties("regexp", attributes=[AttributeMatch("zzz", "def")])),
    ("log_severity_text_regexp_dont_match",
     MatchProperties("regexp", log_severity_texts=["info.*"])),
    ("log_min_severity_trace_dont_match",
     MatchProperties("regexp", severity_min=9)),
    ("log_body_doesnt_match",
     MatchProperties("regexp", log_bodies=[".*TEST.*"])),
    ("strict_body_partial_is_not_equal",
     MatchProperties("strict", log_bodies=["AUTHENTICATION"])),
]

TRUE_CASES = [
    ("attribute_strict_match",
     MatchProperties("strict", attributes=[AttributeMatch("abc", "def")])),
    ("attribute_exists_no_value",
     MatchProperties("strict", attributes=[AttributeMatch("abc")])),
    ("attribute_regex_match",
     MatchProperties("regexp", attributes=[AttributeMatch("abc", "d.f")])),
    ("log_body_regexp_match",
     MatchProperties("regexp", log_bodies=["AUTH.*"])),
    ("log_body_second_pattern_match",
     MatchProperties("regexp", log_bodies=["nope", "FAILED"])),
    ("log_severity_text_regexp_match",
     MatchProperties("regexp", log_severity_texts=["debug.*"])),
    ("log_min_severity_match",
     MatchProperties("regexp", severity_min=5)),
    ("strict_body_exact",
     MatchProperties("strict",
                     log_bodies=["other", "AUTHENTICATION FAILED"])),
]


@pytest.mark.parametrize("name,mp", FALSE_CASES, ids=[c[0] for c in FALSE_CASES])
def test_matching_false(name, mp):
    assert compile_match(mp).mask(_one_row(**LR)).to_pylist() == [False]


@pytest.mark.parametrize("name,mp", TRUE_CASES, ids=[c[0] for c in TRUE_CASES])
def test_matching_true(name, mp):
    assert compile_match(mp).mask(_one_row(**LR)).to_pylist() == [True]


def test_all_groups_must_match():
    # filterlog.go Eval: body AND severity-text AND severity-number AND attrs
    mp = MatchProperties("regexp", log_bodies=["AUTH.*"],
                         log_severity_texts=["info.*"])
    assert compile_match(mp).mask(_one_row(**LR)).to_pylist() == [False]


def test_severity_undefined_controlled_by_match_undefined():
    # severity_matcher.go:24-28 — unspecified(0) ignores min entirely
    batch = pa.table({"severity_number": pa.array([0, 1, 9, None],
                                                  pa.int32())})
    on = MatchProperties("strict", severity_min=9,
                         severity_match_undefined=True)
    off = MatchProperties("strict", severity_min=9)
    assert compile_match(on).mask(batch).to_pylist() == [
        True, False, True, True]
    assert compile_match(off).mask(batch).to_pylist() == [
        False, False, True, False]


def test_missing_attribute_column_never_matches():
    # attributematcher.go:92-100 — absent key -> no match; a column that
    # exists but is null in this row behaves the same in the flat model
    batch = pa.table({"text": ["a", "b"], "tool": ["bash", None]})
    mp = MatchProperties("strict", attributes=[AttributeMatch("tool")])
    assert compile_match(mp).mask(batch).to_pylist() == [True, False]


def test_regexp_value_on_non_string_column():
    batch = pa.table({"code": pa.array([404, 500, None], pa.int32())})
    mp = MatchProperties("regexp", attributes=[AttributeMatch("code", "^4")])
    assert compile_match(mp).mask(batch).to_pylist() == [True, False, False]


def test_skip_expr_include_before_exclude():
    # filterlog.go:30-50 — skip = NOT include OR exclude
    batch = pa.table({
        "text": ["keep me", "keep me", "no match", "keep me"],
        "severity_number": pa.array([9, 9, 9, 9], pa.int32()),
        "tool": ["editor", "bash", "editor", None],
    })
    include = MatchProperties("regexp", log_bodies=["keep"])
    exclude = MatchProperties("strict",
                              attributes=[AttributeMatch("tool", "bash")])
    skip = skip_expr(include, exclude)
    assert skip.mask(batch).to_pylist() == [False, True, True, False]


def test_validation_errors():
    with pytest.raises(ValueError):
        MatchProperties("fuzzy", log_bodies=["x"])
    with pytest.raises(ValueError):
        MatchProperties("strict")  # config.go:189-196 empty properties
    with pytest.raises(ValueError):
        skip_expr(None, None)


def test_filter_logs_dataset_roundtrip(ray_session):
    rows = [
        {"text": "GET /index", "severity_number": 0, "tool": "browser"},
        {"text": "GET /index", "severity_number": 0, "tool": "bash"},
        {"text": "error: boom", "severity_number": 17, "tool": None},
        {"text": "fine", "severity_number": 17, "tool": None},
        {"text": "GET /x", "severity_number": 5, "tool": None},
    ]
    ds = ray.data.from_items(rows)
    include = MatchProperties("regexp", log_bodies=["GET|POST", "error"],
                              severity_min=9,
                              severity_match_undefined=True)
    exclude = MatchProperties("strict",
                              attributes=[AttributeMatch("tool", "bash")])
    out = filter_logs(ds, include, exclude).to_pandas()
    assert sorted(out["text"].tolist()) == ["GET /index", "error: boom"]


def test_config_surface_wiring(ray_session):
    # the collector YAML shape drives filter_matchers + tail_sampling
    # through build_from_config (filterconfig mapstructure + tailsampling
    # policy list)
    from opentelemetry_collector_contrib_ray.pipelines.config import (
        build_from_config)
    import pyarrow as pa
    rows = [
        {"conv_id": "a", "ts": 0, "text": "GET /x", "severity_number": 17,
         "severity_text": "error", "tool": "editor"},
        {"conv_id": "a", "ts": 1_000_000, "text": "GET /y",
         "severity_number": 9, "severity_text": "info", "tool": "editor"},
        {"conv_id": "b", "ts": 0, "text": "GET /z", "severity_number": 5,
         "severity_text": "debug", "tool": "bash"},
    ]
    t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    t = t.set_column(t.column_names.index("ts"), "ts",
                     pa.array([r["ts"] for r in rows], pa.timestamp("us")))
    ds = ray.data.from_arrow(t)
    cfg = {
        "filter_matchers": {
            "include": {"match_type": "regexp", "log_bodies": ["GET"]},
            "exclude": {"match_type": "strict",
                        "attributes": [{"key": "tool", "value": "bash"}]},
        },
        "tail_sampling": {
            "trace_key": "conv_id",
            "policies": [{"type": "status_code",
                          "status_codes": ["ERROR"]}],
        },
    }
    out = build_from_config(ds, cfg).to_pandas()
    # b excluded by matcher; a sampled (has severity 17); both a-rows kept
    assert sorted(out["conv_id"].unique()) == ["a"]
    assert len(out) == 2


def test_strict_attr_type_mismatch_is_no_match_not_crash():
    """A strict AttributeMatch with a non-string value against a batch
    lacking the column (or carrying it at an unrelated type) must simply
    not match — attributematcher.go's typed compare never errors."""
    mp = MatchProperties("strict",
                         attributes=[AttributeMatch("code", 404)])
    missing = pa.table({"text": ["a", "b"]})
    assert compile_match(mp).mask(missing).to_pylist() == [False, False]
    stringly = pa.table({"text": ["a", "b"], "code": ["404", "x"]})
    assert compile_match(mp).mask(stringly).to_pylist() == [False, False]
    typed = pa.table({"text": ["a", "b"], "code": [404, 500]})
    assert compile_match(mp).mask(typed).to_pylist() == [True, False]
