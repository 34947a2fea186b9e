"""Config-driven pipeline builder + condition grammar tests (the YAML
surface: stanza operators list / route table / expr conditions)."""

import pyarrow as pa
import pytest
import ray.data

from opentelemetry_collector_contrib_ray.pipelines.config import (
    build_from_config,
    compile_operators,
    parse_condition,
    register_operator,
)


def _b():
    return pa.table({
        "text": ['level=error code=E1 latency_ms=5 msg="x" tool=bash',
                 "plain line"],
        "sev": pa.array([17, 0], pa.int32()),
        "role": ["user", "assistant"],
    })


def test_condition_grammar():
    b = _b()
    assert parse_condition('sev >= 17').mask(b).to_pylist() == [True, False]
    assert parse_condition('role == "user" or sev > 10').mask(b).to_pylist() \
        == [True, False]
    assert parse_condition('not (sev == 17)').mask(b).to_pylist() == \
        [False, True]
    assert parse_condition('text matches "^level="').mask(b).to_pylist() == \
        [True, False]
    assert parse_condition('text contains "plain"').mask(b).to_pylist() == \
        [False, True]
    assert parse_condition('role in ["user", "system"]').mask(b).to_pylist() \
        == [True, False]
    assert parse_condition('sev != 17 and role == "assistant"') \
        .mask(b).to_pylist() == [False, True]


def test_condition_errors():
    with pytest.raises(ValueError):
        parse_condition('sev >=')
    with pytest.raises(ValueError):
        parse_condition('sev ~~ 3')


def test_compile_operator_chain():
    fn = compile_operators([
        {"type": "key_value_parser", "keys": ["level", "code"]},
        {"type": "severity_parser", "parse_from": "attr_level"},
        {"type": "add", "field": "env", "value": "prod"},
        {"type": "copy", "from": "env", "to": "env2"},
        {"type": "remove", "fields": ["env"]},
    ])
    out = fn(_b())
    assert out["attr_code"].to_pylist() == ["E1", None]
    assert out["severity_number"].to_pylist() == [17, 0]
    assert "env" not in out.column_names and out["env2"].to_pylist() == \
        ["prod", "prod"]


def test_full_config_pipeline():
    cfg = {
        "operators": [
            {"type": "key_value_parser", "keys": ["level"]},
            {"type": "severity_parser", "parse_from": "attr_level"},
            {"type": "filter", "expr": 'text contains "never-matches"'},
        ],
        "routes": [
            {"condition": "severity_number >= 17", "sink": "errors"},
            {"condition": 'role == "assistant"', "sink": "agent"},
        ],
        "default_sink": "rest",
    }
    ds = ray.data.from_arrow(_b())
    out = build_from_config(ds, cfg).to_pandas()
    assert list(out["sink"]) == ["errors", "agent"]


def test_register_operator_extension():
    register_operator("exclaim", lambda cfg: lambda b: b.append_column(
        "bang", pa.array(["!"] * b.num_rows)))
    fn = compile_operators([{"type": "exclaim"}])
    assert fn(_b())["bang"].to_pylist() == ["!", "!"]
    with pytest.raises(ValueError):
        compile_operators([{"type": "nope"}])


def test_build_from_config_with_transform_groups(ray_session):
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.pipelines.config import (
        build_from_config,
    )

    t = pa.table({
        "text": ["hello world", "skip me"],
        "role": ["user", "tool"],
    })
    cfg = {
        "transform": [{
            "context": "log",
            "conditions": ['role == "user"'],
            "statements": ['set(shout, ConvertCase(text, "upper"))'],
            "error_mode": "propagate",
        }],
        "routes": [{"condition": 'role == "user"', "sink": "users"}],
        "default_sink": "rest",
    }
    out = build_from_config(ray.data.from_arrow(t), cfg).to_pandas()
    got = dict(zip(out.role, out.shout))
    assert got["user"] == "HELLO WORLD" and got["tool"] is None
    assert sorted(out.sink) == ["rest", "users"]


def test_config_yaml_file_roundtrip(tmp_path, ray_session):
    import pyarrow as pa
    import ray.data

    from opentelemetry_collector_contrib_ray.pipelines.config import (
        build_from_config_file,
    )

    cfg = tmp_path / "pipeline.yaml"
    cfg.write_text("""
operators:
  - type: regex_parser
    regex: "^(?P<word>\\\\w+)"
transform:
  - statements:
      - set(upper, ConvertCase(word, "upper"))
routes:
  - condition: 'upper == "HELLO"'
    sink: greetings
default_sink: other
""")
    t = pa.table({"text": ["hello there", "bye now"]})
    out = build_from_config_file(ray.data.from_arrow(t), str(cfg)).to_pandas()
    got = dict(zip(out.word, out.sink))
    assert got["hello"] == "greetings" and got["bye"] == "other"
