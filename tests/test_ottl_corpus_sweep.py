"""Corpus-level OTTL coverage sweep: every statement the reference's e2e
suite (pkg/ottl/e2e/e2e_test.go) and logs-processor suite
(processor/transformprocessor/internal/logs/processor_test.go) contains
must either execute through transform_processor / value_expression, or
fail with the reference's OWN expected error (the three error-path cases
of Test_e2e_errors and the ParseJSON type-error family).

Output-exactness for the corpus is pinned case-by-case in
test_statement_executor.py / test_processor_replay.py; this sweep pins
BREADTH — no statement in either reference suite is unparseable or
uncompilable. Skipped when the reference checkout isn't present.
"""

import pathlib
import re

import pytest

from opentelemetry_collector_contrib_ray.pipelines.statements import (
    transform_processor,
    value_expression,
)

REF = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference checkout not present")

# statements whose reference test asserts an ERROR (e2e_test.go:378-394 and
# the ParseJSON StringGetter type-error cases of processor_test.go): our
# executor must raise — pattern fragments matched against the message
EXPECT_ERROR = {
    'set(attributes["newOne"], attributes[1])':
        "unable to resolve a string index in map",
    'set(attributes["array"][0.0], "bar")':
        "unable to resolve an integer index in slice",
    'set(attributes["array"][ConvertCase(attributes["A|B|C"], "upper")], "bar")':
        "unable to resolve an integer index in slice",
}
ERROR_RE = re.compile(r"ParseJSON\((?:\d|true|false)")

# span-context-only statements (IsRootSpan needs parent_span_id — span
# scope is outside the log-pipeline north rule)
OUT_OF_SCOPE = re.compile(r"IsRootSpan")


def _stmts(path: str, pattern: str) -> list[str]:
    src = (REF / path).read_text()
    return sorted({s for s in re.findall(pattern, src) if "%s" not in s})


def _run_any(stmt: str) -> None:
    """Execute `stmt` against each fixture/context until one succeeds;
    re-raise the last error if none does."""
    import test_statement_executor as T
    last = None
    for ctx in ("log", "resource", "scope"):
        for fx in (T.fixture, T.fixture_editors, T.fixture_valexpr):
            try:
                fn = transform_processor([{
                    "context": ctx, "conditions": [], "statements": [stmt],
                    "error_mode": "propagate"}])
                fn(fx())
                return
            except Exception as e:  # noqa: BLE001 — sweep collects any
                last = e
    raise last


def test_e2e_statement_corpus_sweep(ray_session):
    stmts = _stmts("pkg/ottl/e2e/e2e_test.go", r"statement:\s+`([^`]+)`")
    assert len(stmts) >= 170
    import test_statement_executor as T
    unexpected = []
    for s in stmts:
        if OUT_OF_SCOPE.search(s):
            continue
        if s in EXPECT_ERROR:
            # Test_e2e_errors runs these in log context over the standard
            # fixture and asserts the error — replicate exactly
            fn = transform_processor([{
                "context": "log", "conditions": [], "statements": [s],
                "error_mode": "propagate"}])
            try:
                fn(T.fixture())
                unexpected.append((s, "expected error, got success"))
            except Exception as e:  # noqa: BLE001
                if EXPECT_ERROR[s] not in str(e):
                    unexpected.append((s, str(e)))
            continue
        try:
            _run_any(s)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            # value-expression cases aren't statements: they must evaluate
            # through the ParseValueExpression analogue instead
            try:
                value_expression(s)(T.fixture_valexpr())
            except Exception:  # noqa: BLE001
                unexpected.append((s, msg))
    assert not unexpected, unexpected


def test_logs_processor_statement_corpus_sweep(ray_session):
    stmts = _stmts(
        "processor/transformprocessor/internal/logs/processor_test.go",
        r"`([a-z][a-z_]*\([^`]*)`")
    assert len(stmts) >= 100
    unexpected = []
    for s in stmts:
        try:
            _run_any(s)
        except Exception as e:  # noqa: BLE001
            if ERROR_RE.search(s) and "expected string but got" in str(e):
                continue
            unexpected.append((s, str(e)))
    assert not unexpected, unexpected


def test_metrics_processor_statement_corpus_sweep(ray_session):
    """Every statement in processor/transformprocessor/internal/metrics/
    processor_test.go must execute in the metric or datapoint context over
    the flat constructMetrics fixture (test_metric_editors.metrics_fixture).
    Output exactness for the structural editors is pinned case-by-case in
    test_metric_editors.py; this sweep pins breadth."""
    import test_metric_editors as ME
    stmts = _stmts(
        "processor/transformprocessor/internal/metrics/processor_test.go",
        r"`([a-z][a-z_]*\([^`]*)`")
    assert len(stmts) >= 100
    unexpected = []
    for s in stmts:
        last = None
        # scope/resource for the context-inferred scope.cache/resource.*
        # statements the metrics suite also carries
        for ctx in ("metric", "datapoint", "scope", "resource"):
            try:
                fn = transform_processor([{
                    "context": ctx, "conditions": [], "statements": [s],
                    "error_mode": "propagate"}])
                fn(ME.metrics_fixture())
                last = None
                break
            except Exception as e:  # noqa: BLE001
                last = e
        if last is not None:
            if ERROR_RE.search(s) and "expected string but got" in str(last):
                continue
            unexpected.append((s, str(last)))
    assert not unexpected, unexpected


def test_filterprocessor_condition_corpus_sweep(ray_session):
    """Every OTTL condition in processor/filterprocessor's logs_test.go
    and metrics_test.go must compile and evaluate to a boolean mask over
    the flat fixtures (the `MetricName ==` case is the legacy 'expr'
    language, not OTTL — excluded)."""
    import pyarrow as pa
    import test_metric_editors as ME
    import test_statement_executor as T
    conds = sorted(set(
        _stmts("processor/filterprocessor/logs_test.go", r"`([^`]+)`") +
        _stmts("processor/filterprocessor/metrics_test.go", r"`([^`]+)`")))
    assert len(conds) >= 20
    unexpected = []
    for c in conds:
        if c.startswith("MetricName"):  # expr language, not OTTL
            continue
        ok = False
        last = None
        for ctx, fx in (("datapoint", ME.metrics_fixture),
                        ("metric", ME.metrics_fixture),
                        ("log", T.fixture)):
            try:
                fn = transform_processor([{
                    "context": ctx, "conditions": [c],
                    "statements": ['set(attributes["swept"], "y")'],
                    "error_mode": "propagate"}])
                out = fn(fx())
                assert isinstance(out, pa.Table)
                ok = True
                break
            except Exception as e:  # noqa: BLE001
                last = e
        if not ok:
            unexpected.append((c, str(last)))
    assert not unexpected, unexpected
