"""Grok pattern compiler: %{PATTERN:name:type} -> RE2 named-capture regex.

Reference: OTTL ExtractGrokPatterns (pkg/ottl/ottlfuncs/
func_extract_grok_patterns.go:38-90) wraps elastic/go-grok: a grok expression
references a library of named sub-patterns, compiles to one regex with named
captures, and optionally types captures (int/long/float/bool).

We compile grok -> RE2 source text (pure string expansion, recursive with a
depth cap) and execute via pyarrow.compute.extract_regex — the same zero-copy
vectorized path as every other parser. Default pattern library mirrors the
commonly-used core of the grok ecosystem (logstash-patterns; public corpus).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# Core pattern library (subset of the public logstash/go-grok base set).
BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?(?:[0-9]+)",
    "NUMBER": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?)",
    "BASE10NUM": r"[+-]?(?:[0-9]+(?:\.[0-9]+)?)",
    "POSINT": r"\b[1-9][0-9]*\b",
    "NONNEGINT": r"\b[0-9]+\b",
    "BOOL": r"true|false",
    "QUOTEDSTRING": r'"(?:[^"\\]*(?:\\.[^"\\]*)*)"',
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": (r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(?:\.(?:25[0-5]"
             r"|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}"),
    "IP": (r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)(?:\.(?:25[0-5]"
           r"|2[0-4][0-9]|[01]?[0-9][0-9]?)){3}"),
    "HOSTNAME": (r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z]"
                 r"[0-9A-Za-z-]{0,62}))*\.?\b"),
    # URI family (public logstash base + go-grok ECS aws set)
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "URIPROTO": r"[A-Za-z]+(?:\+[A-Za-z+]+)?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIQUERY": r"[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "ELB_URIHOST": r"%{IPORHOST:[url][domain]}(?::%{POSINT:[url][port]:int})?",
    "ELB_URIPATHPARAM":
        r"%{URIPATH:[url][path]}(?:\?%{URIQUERY:[url][query]})?",
    "ELB_URI": (r"%{URIPROTO:[url][scheme]}://"
                r"(?:%{USER:[url][username]}(?::[^@]*)?@)?"
                r"(?:%{ELB_URIHOST})?(?:%{ELB_URIPATHPARAM})?"),
    "EMAILADDRESS": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "USER": r"[a-zA-Z0-9._-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "MONTH": (r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|"
              r"Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|"
              r"Nov(?:ember)?|Dec(?:ember)?)\b"),
    "MONTHDAY": r"(?:0[1-9]|[12][0-9]|3[01]|[1-9])",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"2[0123]|[01]?[0-9]",
    "MINUTE": r"[0-5][0-9]",
    "SECOND": r"(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?",
    "TIME": r"(?:2[0123]|[01][0-9]):(?:[0-5][0-9]):(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?)",
    "TIMESTAMP_ISO8601": (r"(?:\d\d){1,2}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12][0-9]"
                          r"|3[01])[T ](?:2[0123]|[01]?[0-9]):?(?:[0-5][0-9])"
                          r"(?::?(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?))?"
                          r"(?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?(?:[0-5][0-9])))?"),
    "HTTPDATE": r"(?:0[1-9]|[12][0-9]|3[01]|[1-9])/\w{3}/(?:\d\d){1,2}:(?:2[0123]|[01][0-9]):(?:[0-5][0-9]):(?:[0-5][0-9]) [+-][0-9]{4}",
    "LOGLEVEL": (r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|"
                 r"NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?"
                 r"(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|"
                 r"[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|"
                 r"SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)"),
    "SYSLOGTIMESTAMP": (r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?"
                        r"|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?"
                        r"|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b +"
                        r"(?:0[1-9]|[12][0-9]|3[01]|[1-9]) "
                        r"(?:2[0123]|[01][0-9]):(?:[0-5][0-9]):(?:[0-5][0-9])"),
}

# Date/time + URI + network families (public logstash / elastic go-grok
# base set, RE2-safe forms — no lookarounds/atomic groups; exercised by
# func_extract_grok_patterns_test.go: DATE/DATESTAMP/TZ/URI/ELB_URI)
BASE_PATTERNS.update({
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHNUM2": r"(?:0[1-9]|1[0-2])",
    "DAY": (r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|"
            r"Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)"),
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "DATE": r"%{DATE_US}|%{DATE_EU}",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "TZ": r"(?:[APMCE][SD]T|UTC)",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "ISO8601_SECOND": r"%{SECOND}",
    "DATESTAMP_RFC822": r"%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_RFC2822":
        r"%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "DATESTAMP_EVENTLOG":
        r"%{YEAR}%{MONTHNUM2}%{MONTHDAY}%{HOUR}%{MINUTE}%{SECOND}",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATHPARAM": r"%{URIPATH}(?:\?%{URIQUERY})?",
    "URIPARAM": r"\?%{URIQUERY}",
    "URI": (r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?"
            r"(?:%{URIHOST})?(?:%{URIPATHPARAM})?"),
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "WINPATH": r"(?:[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "COMMONMAC": r"(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2}",
    "CISCOMAC": r"(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4}",
    "WINDOWSMAC": r"(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2}",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    "IPV6": (r"(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|"
             r"(?:[0-9A-Fa-f]{1,4}:){1,7}:|"
             r"(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}|"
             r"(?:[0-9A-Fa-f]{1,4}:){1,5}(?::[0-9A-Fa-f]{1,4}){1,2}|"
             r"(?:[0-9A-Fa-f]{1,4}:){1,4}(?::[0-9A-Fa-f]{1,4}){1,3}|"
             r"(?:[0-9A-Fa-f]{1,4}:){1,3}(?::[0-9A-Fa-f]{1,4}){1,4}|"
             r"(?:[0-9A-Fa-f]{1,4}:){1,2}(?::[0-9A-Fa-f]{1,4}){1,5}|"
             r"[0-9A-Fa-f]{1,4}:(?::[0-9A-Fa-f]{1,4}){1,6}|"
             r":(?:(?::[0-9A-Fa-f]{1,4}){1,7}|:)|"
             r"::(?:ffff(?::0{1,4})?:)?%{IPV4}|"
             r"(?:[0-9A-Fa-f]{1,4}:){1,4}:%{IPV4})"),
    "QS": r"%{QUOTEDSTRING}",
    "SYSLOGFACILITY": r"<%{NONNEGINT}.%{NONNEGINT}>",
    "SYSLOGHOST": r"%{IPORHOST}",
    "EMAILLOCALPART": r"[a-zA-Z0-9!#$%&'*+\-/=?^_`{|}~.]+",
})
# IP covers both families now that IPV6 exists (go-grok base set)
BASE_PATTERNS["IP"] = r"(?:%{IPV6}|%{IPV4})"

# composite patterns built from the pieces (classic logstash core set)
BASE_PATTERNS["COMMONAPACHELOG"] = (
    r'%{IPV4:clientip} %{NOTSPACE:ident} %{NOTSPACE:auth} '
    r'\[%{HTTPDATE:timestamp}\] "(?:%{WORD:verb} %{NOTSPACE:request}'
    r'(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" '
    r'%{NONNEGINT:response:int} (?:%{NONNEGINT:bytes:int}|-)')
BASE_PATTERNS["COMBINEDAPACHELOG"] = (
    r'%{COMMONAPACHELOG} "(?P<referrer>[^"]*)" "(?P<agent>[^"]*)"')
BASE_PATTERNS["PROG"] = r"[^\[\s:]+"
BASE_PATTERNS["SYSLOGPROG"] = (
    r'%{PROG:program}(?:\[%{POSINT:pid:int}\])?')
BASE_PATTERNS["SYSLOGLINE"] = (
    r'%{SYSLOGTIMESTAMP:timestamp} %{NOTSPACE:logsource} '
    r'%{SYSLOGPROG}: %{GREEDYDATA:message}')

# Remaining public logstash / go-grok families (grok.NewComplete() loads
# these sets; bodies are the legacy logstash corpus rewritten RE2-safe —
# non-capturing groups, no lookarounds). Pure pattern DATA, not code.
BASE_PATTERNS.update({
    # base completions
    "BASE16NUM": r"[+-]?(?:0x)?(?:[0-9A-Fa-f]+)",
    "BASE16FLOAT": (r"\b[+-]?(?:0x)?(?:(?:[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?)"
                    r"|(?:\.[0-9A-Fa-f]+))\b"),
    "URN": (r"urn:[0-9A-Za-z][0-9A-Za-z-]{0,31}:"
            r"(?:%[0-9a-fA-F]{2}|[0-9A-Za-z()+,.:=@;$_!*'/?#-])+"),
    "TTY": r"/dev/(?:pts|tty(?:[pq])?)(?:\w+)?/?(?:[0-9]+)",
    # httpd error-log family
    "HTTPDUSER": r"%{EMAILADDRESS}|%{USER}",
    "HTTPDERROR_DATE": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
    "HTTPD20_ERRORLOG": (
        r"\[%{HTTPDERROR_DATE:timestamp}\] \[%{LOGLEVEL:loglevel}\] "
        r"(?:\[client %{IPORHOST:clientip}\] )?%{GREEDYDATA:message}"),
    "HTTPD24_ERRORLOG": (
        r"\[%{HTTPDERROR_DATE:timestamp}\] "
        r"\[(?:%{WORD:module})?:%{LOGLEVEL:loglevel}\] "
        r"\[pid %{POSINT:pid}(?::tid %{NUMBER:tid})?\]"
        r"(?: \(%{POSINT:proxy_errorcode}\)%{DATA:proxy_message}:)?"
        r"(?: \[client %{IPORHOST:clientip}:%{POSINT:clientport}\])?"
        r"(?: %{DATA:errorcode}:)? %{GREEDYDATA:message}"),
    "HTTPD_ERRORLOG": r"%{HTTPD20_ERRORLOG}|%{HTTPD24_ERRORLOG}",
    # java / tomcat
    "JAVACLASS": r"(?:[a-zA-Z$_][a-zA-Z$_0-9]*\.)*[a-zA-Z$_][a-zA-Z$_0-9]*",
    "JAVAFILE": r"(?:[a-zA-Z$_0-9. -]+)",
    "JAVAMETHOD": r"(?:(?:<(?:cl)?init>)|[a-zA-Z$_][a-zA-Z$_0-9]*)",
    "JAVASTACKTRACEPART": (
        r"%{SPACE}at %{JAVACLASS:class}\.%{JAVAMETHOD:method}"
        r"\(%{JAVAFILE:file}(?::%{NUMBER:line})?\)"),
    "JAVATHREAD": r"(?:[A-Z]{2}-Processor[\d]+)",
    "JAVALOGMESSAGE": r"(?:.*)",
    "CATALINA_DATESTAMP":
        r"%{MONTH} %{MONTHDAY}, %{YEAR} %{HOUR}:%{MINUTE}:%{SECOND} (?:AM|PM)",
    "CATALINALOG": (r"%{CATALINA_DATESTAMP:timestamp} %{JAVACLASS:class} "
                    r"%{JAVALOGMESSAGE:logmessage}"),
    "TOMCAT_DATESTAMP":
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY} %{HOUR}:%{MINUTE}:%{SECOND}",
    "TOMCATLOG": (r"%{TOMCAT_DATESTAMP:timestamp} \| %{LOGLEVEL:level} \| "
                  r"%{JAVACLASS:class} - %{JAVALOGMESSAGE:logmessage}"),
    # syslog (RFC5424 + cron)
    "SYSLOG5424PRINTASCII": r"[!-~]+",
    "SYSLOG5424PRI": r"<[0-9]{1,5}>",
    "SYSLOG5424SD": r"\[%{DATA}\]+",
    "SYSLOG5424BASE": (
        r"%{SYSLOG5424PRI}%{NONNEGINT:syslog5424_ver} +"
        r"(?:%{TIMESTAMP_ISO8601:syslog5424_ts}|-) +"
        r"(?:%{IPORHOST:syslog5424_host}|-) +"
        r"(?:-|%{SYSLOG5424PRINTASCII:syslog5424_app}) +"
        r"(?:-|%{SYSLOG5424PRINTASCII:syslog5424_proc}) +"
        r"(?:-|%{SYSLOG5424PRINTASCII:syslog5424_msgid}) +"
        r"(?:%{SYSLOG5424SD:syslog5424_sd}|-|)"),
    "SYSLOG5424LINE": r"%{SYSLOG5424BASE} +%{GREEDYDATA:syslog5424_msg}",
    "SYSLOGBASE": (r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?"
                   r"%{SYSLOGHOST:logsource} %{SYSLOGPROG}:"),
    "CRON_ACTION": r"[A-Z ]+",
    "CRONLOG": (r"%{SYSLOGBASE} \(%{USER:user}\) %{CRON_ACTION:action} "
                r"\(%{DATA:message}\)"),
    # aws access logs
    "S3_REQUEST_LINE":
        r"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?)",
    "S3_ACCESS_LOG": (
        r"%{WORD:owner} %{NOTSPACE:bucket} \[%{HTTPDATE:timestamp}\] "
        r"%{IP:clientip} %{NOTSPACE:requester} %{NOTSPACE:request_id} "
        r"%{NOTSPACE:operation} %{NOTSPACE:key} "
        r'(?:"%{S3_REQUEST_LINE}"|-) (?:%{INT:response:int}|-) '
        r"(?:-|%{NOTSPACE:error_code}) (?:%{INT:bytes:int}|-) "
        r"(?:%{INT:object_size:int}|-) (?:%{INT:request_time_ms:int}|-) "
        r"(?:%{INT:turnaround_time_ms:int}|-) "
        r'(?:%{QS:referrer}|-) (?:"?%{QS:agent}"?|-) '
        r"(?:-|%{NOTSPACE:version_id})"),
    "ELB_REQUEST_LINE":
        r"(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?)",
    "ELB_ACCESS_LOG": (
        r"%{TIMESTAMP_ISO8601:timestamp} %{NOTSPACE:elb} "
        r"%{IP:clientip}:%{INT:clientport:int} "
        r"(?:(?:%{IP:backendip}:?:%{INT:backendport:int})|-) "
        r"%{NUMBER:request_processing_time:float} "
        r"%{NUMBER:backend_processing_time:float} "
        r"%{NUMBER:response_processing_time:float} "
        r"%{INT:response:int} %{INT:backend_response:int} "
        r"%{INT:received_bytes:int} %{INT:bytes:int} "
        r'"%{ELB_REQUEST_LINE}"'
        r'(?: "%{QS:userAgent}"(?: %{NOTSPACE:ssl_cipher} '
        r"%{NOTSPACE:ssl_protocol})?)?"),
    # databases / app frameworks
    "MONGO_LOG": (r"%{SYSLOGTIMESTAMP:timestamp} \[%{WORD:component}\] "
                  r"%{GREEDYDATA:message}"),
    "MONGO3_SEVERITY": r"\w",
    "MONGO3_COMPONENT": r"%{WORD}|-",
    "MONGO3_LOG": (
        r"%{TIMESTAMP_ISO8601:timestamp} %{MONGO3_SEVERITY:severity} "
        r"%{MONGO3_COMPONENT:component}%{SPACE}"
        r"(?:\[%{DATA:context}\])? %{GREEDYDATA:message}"),
    "POSTGRESQL": (r"%{DATESTAMP:timestamp} %{TZ} %{DATA:user_id} "
                   r"%{GREEDYDATA:connection_id} %{POSINT:pid}"),
    "REDISTIMESTAMP": r"%{MONTHDAY} %{MONTH} %{TIME}",
    "REDISLOG": r"\[%{POSINT:pid}\] %{REDISTIMESTAMP:timestamp} \*",
    "REDISMONLOG": (
        r'%{NUMBER:timestamp} \[%{INT:database} %{IP:client}:%{NUMBER:port}\]'
        r' "%{WORD:command}"\s?%{GREEDYDATA:params}'),
    "RUBY_LOGLEVEL": r"(?:DEBUG|FATAL|ERROR|WARN|INFO)",
    "RUBY_LOGGER": (
        r"[DFEWI], \[%{TIMESTAMP_ISO8601:timestamp} #%{POSINT:pid}\] *"
        r"%{RUBY_LOGLEVEL:loglevel} -- +%{DATA:progname}: "
        r"%{GREEDYDATA:message}"),
    "MAVEN_VERSION": (r"(?:(?:\d+)\.)?(?:(?:\d+)\.)?(?:\d+)"
                      r"(?:[.-](?:RELEASE|SNAPSHOT))?"),
})
# httpd modern aliases (logstash renamed the apache patterns)
BASE_PATTERNS["HTTPD_COMMONLOG"] = BASE_PATTERNS["COMMONAPACHELOG"]
BASE_PATTERNS["HTTPD_COMBINEDLOG"] = BASE_PATTERNS["COMBINEDAPACHELOG"]

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?(?::(\w+))?\}")

_TYPE_CASTS = {
    "int": pa.int64(), "long": pa.int64(),
    "float": pa.float64(), "double": pa.float64(),
    "bool": pa.bool_(),
}


def _noncapture_unnamed(src: str) -> str:
    """Rewrite unnamed capture groups ``(`` -> ``(?:``. go-grok compiles
    a pattern like ``(.*)`` fine (unnamed groups simply contribute no
    named captures, func_extract_grok_patterns_test.go 'no named capture
    group'); Arrow's extract_regex rejects any unnamed group, so
    neutralize them while keeping escapes and char-classes intact."""
    out = []
    i, n = 0, len(src)
    in_class = False
    while i < n:
        c = src[i]
        if c == "\\" and i + 1 < n:
            out.append(src[i:i + 2])
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(" and src[i + 1:i + 2] != "?":
            out.append("(?:")
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


class GrokCompiler:
    """Compile grok expressions against a pattern library. Extend via
    ``GrokCompiler(extra={"MYPAT": r"..."})`` — the custom-definitions knob
    of ExtractGrokPatterns."""

    def __init__(self, extra: dict[str, str] | None = None,
                 max_depth: int = 16):
        self.patterns = dict(BASE_PATTERNS)
        if extra:
            for k in extra:
                # go-grok AddPattern parity: a pattern ID carrying ':'
                # would be unparseable as a later %{ID:alias} reference
                if ":" in k:
                    raise ValueError(
                        f"pattern ID {k!r} should not contain ':'")
            self.patterns.update(extra)
        self.max_depth = max_depth

    def compile(self, expression: str,
                named_captures_only: bool = True) \
            -> tuple[str, dict[str, pa.DataType], dict[str, str]]:
        """-> (RE2 source with named captures, {capture: arrow type},
        {capture group: display name}).

        Display names follow go-grok's ECS convention: a ``[url][port]``
        capture surfaces as ``url.port`` (nested-field syntax flattened
        with dots); RE2 group names must be identifiers, so the group
        carries a sanitized alias and the display map restores the real
        name at extraction time.

        ``named_captures_only=False`` mirrors go-grok's default mode: an
        un-aliased ``%{NAME}`` reference still captures under the pattern
        name itself (first occurrence; RE2 rejects duplicate group
        names, so repeats fall back to non-capturing)."""
        types: dict[str, pa.DataType] = {}
        names: dict[str, str] = {}
        seen_names: set[str] = set()

        def expand(expr: str, depth: int) -> str:
            if depth > self.max_depth:
                raise ValueError("grok recursion depth exceeded")

            def sub(m: re.Match) -> str:
                pat, name, typ = m.group(1), m.group(2), m.group(3)
                if pat not in self.patterns:
                    raise ValueError(f"unknown grok pattern %{{{pat}}}")
                body = expand(self.patterns[pat], depth + 1)
                if not name:
                    if named_captures_only or pat in seen_names:
                        return f"(?:{body})"
                    seen_names.add(pat)
                    names[pat] = pat
                    return f"(?P<{pat}>{body})"
                display = (".".join(re.findall(r"\[(\w+)\]", name))
                           if name.startswith("[") else name)
                safe = re.sub(r"\W", "_", name)
                if safe in seen_names:  # RE2 rejects duplicate group names
                    return f"(?:{body})"
                seen_names.add(safe)
                names[safe] = display
                if typ:
                    types[safe] = _TYPE_CASTS.get(typ, pa.string())
                return f"(?P<{safe}>{body})"

            return _GROK_REF.sub(sub, expr)

        src = _noncapture_unnamed(expand(expression, 0))
        # factory-time validation like extractGrokPatterns: an invalid
        # regex or (in named-captures-only mode) a capture-less pattern
        # should fail at compile, not on the first batch
        try:
            pc.extract_regex(pa.array([], pa.string()), src)
        except pa.ArrowInvalid as e:
            raise ValueError(f"invalid grok pattern: {e}") from e
        if named_captures_only and not seen_names \
                and "(?P<" not in expression:
            raise ValueError(
                "at least 1 named capture group must be supplied")
        return src, types, names


def parse_pattern_definitions(defs: list[str]) -> dict[str, str]:
    """OTTL PatternDefinitions arg: 'NAME=pattern' strings -> dict, with
    the reference's validation (func_extract_grok_patterns.go:44-65)."""
    out: dict[str, str] = {}
    for i, d in enumerate(defs):
        key, eq, val = d.partition("=")
        if not eq:
            trimmed = d if len(d) <= 20 else d[:17] + "..."
            raise ValueError(
                f"pattern {trimmed!r} supplied to ExtractGrokPatterns at "
                f"index {i} has incorrect format, expecting "
                "PATTERNNAME=pattern definition")
        if ":" in key:
            raise ValueError(f"pattern ID {key!r} should not contain ':'")
        out[key] = val
    return out


def extract_grok_patterns(expression: str, parse_from: str = "text",
                          prefix: str = "", extra: dict[str, str] | None = None,
                          on_error: str = "send",
                          named_captures_only: bool = True,
                          pattern_definitions: list[str] | None = None):
    """OTTL ExtractGrokPatterns as a map_batches stage: named captures ->
    columns (typed captures cast per the :type suffix).
    ``pattern_definitions``: 'NAME=pattern' strings, the OTTL arg form."""
    if pattern_definitions:
        extra = dict(extra or {}, **parse_pattern_definitions(
            list(pattern_definitions)))
    regex, types, names = GrokCompiler(extra).compile(
        expression, named_captures_only=named_captures_only)

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[parse_from]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        st = pc.extract_regex(col, regex)
        for i in range(st.type.num_fields):
            name = st.type.field(i).name
            arr = pc.struct_field(st, name)
            if name in types and not pa.types.is_string(types[name]):
                # a non-participating optional group surfaces as '' (Arrow
                # extract_regex has no absent marker): '' is not a value
                # of any typed capture, so null it instead of failing the
                # numeric cast for the whole batch
                arr = pc.if_else(pc.equal(arr, ""),
                                 pa.nulls(len(arr), pa.string()), arr)
                if pa.types.is_boolean(types[name]):
                    arr = pc.equal(arr, "true")
                else:
                    # INT/NUMBER allow a leading '+' that Arrow's numeric
                    # cast rejects — strip it so '+5' parses instead of
                    # failing the whole batch
                    arr = pc.cast(
                        pc.replace_substring_regex(arr, r"^\+", ""),
                        types[name])
            batch = batch.append_column(prefix + names.get(name, name), arr)
        if on_error == "drop":
            batch = batch.filter(st.is_valid())
        return batch

    return fn
