"""Log data model: the OTel LogRecord envelope flattened to Arrow columns.

Reference semantics (studied, not ported):
  - 25-level severity enum: pkg/stanza/entry/severity.go:11-50
  - text alias mapping (default preset incl. "warning"/"err" extras):
    pkg/stanza/operator/helper/severity_builder.go:17-91
  - HTTP-status range sugar 2xx/3xx/4xx/5xx:
    pkg/stanza/operator/helper/severity_builder.go:94-104 (expandRange)
  - syslog priority -> severity table:
    pkg/stanza/operator/parser/syslog/parser.go:239-260

The hierarchy ResourceLogs -> ScopeLogs -> LogRecord is NOT materialized;
it is recoverable as groupby(resource columns), exactly as the reference's
ConvertEntries does (pkg/stanza/adapter/converter.go:20-55).
"""

from __future__ import annotations

import pyarrow as pa

# --- severity enum (entry.Severity) -------------------------------------
DEFAULT = 0
TRACE, TRACE2, TRACE3, TRACE4 = 1, 2, 3, 4
DEBUG, DEBUG2, DEBUG3, DEBUG4 = 5, 6, 7, 8
INFO, INFO2, INFO3, INFO4 = 9, 10, 11, 12
WARN, WARN2, WARN3, WARN4 = 13, 14, 15, 16
ERROR, ERROR2, ERROR3, ERROR4 = 17, 18, 19, 20
FATAL, FATAL2, FATAL3, FATAL4 = 21, 22, 23, 24

SEVERITY_NAMES = {
    DEFAULT: "default",
    TRACE: "trace", TRACE2: "trace2", TRACE3: "trace3", TRACE4: "trace4",
    DEBUG: "debug", DEBUG2: "debug2", DEBUG3: "debug3", DEBUG4: "debug4",
    INFO: "info", INFO2: "info2", INFO3: "info3", INFO4: "info4",
    WARN: "warn", WARN2: "warn2", WARN3: "warn3", WARN4: "warn4",
    ERROR: "error", ERROR2: "error2", ERROR3: "error3", ERROR4: "error4",
    FATAL: "fatal", FATAL2: "fatal2", FATAL3: "fatal3", FATAL4: "fatal4",
}


def _aliases_mapping() -> dict[str, int]:
    """'otel'/'aliases' builtin preset (severity_builder.go:23-71)."""
    m: dict[str, int] = {}
    for num, name in SEVERITY_NAMES.items():
        if num == DEFAULT:
            continue
        m[name] = num
        m[str(num)] = num
    return m


def default_severity_mapping() -> dict[str, int]:
    """Default preset = aliases + warning*/err* extras (severity_builder.go:73-86).

    Keys are matched lowercased, mirroring severityMap.find's strings.ToLower.
    """
    m = _aliases_mapping()
    m.update({"warning": WARN, "warning2": WARN2, "warning3": WARN3,
              "warning4": WARN4, "err": ERROR, "err2": ERROR2,
              "err3": ERROR3, "err4": ERROR4})
    return m


# HTTP status range sugar. The reference lets config map any severity to the
# literal keys "2xx".."5xx" (severity_builder.go:94-104). Our flagship pipeline
# uses the conventional mapping below (documented divergence: the reference has
# no *default* range mapping; this is a config choice).
HTTP_RANGE_SEVERITY = {2: INFO, 3: INFO2, 4: WARN, 5: ERROR}

# syslog priority&7 -> (severity_number, severity_text)
# parser.go:239-260: 0 emerg->Fatal, 1 alert->Error3, 2 crit->Error2,
# 3 err->Error, 4 warning->Warn, 5 notice->Info2, 6 info->Info, 7 debug->Debug
SYSLOG_SEVERITY = [FATAL, ERROR3, ERROR2, ERROR, WARN, INFO2, INFO, DEBUG]
SYSLOG_SEVERITY_TEXT = ["emerg", "alert", "crit", "err", "warning", "notice",
                        "info", "debug"]

# --- transcript input schema (BASELINE.json input_hint) ------------------
TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

ROLES = ["system", "user", "assistant", "tool"]
TOOLS = ["bash", "search", "browser", "editor", ""]


def severity_bucket(num: int) -> str:
    """Coarse bucket used for per-sink aggregate counts (trace..fatal)."""
    if num <= 0:
        return "default"
    for lo, name in ((FATAL, "fatal"), (ERROR, "error"), (WARN, "warn"),
                     (INFO, "info"), (DEBUG, "debug"), (TRACE, "trace")):
        if num >= lo:
            return name
    return "default"
