"""Grok pattern → Python regex compiler.

Implements the public grok semantics used by VRL's ``parse_grok``
(reference: the reference repo ships grok via the vrl crate; the
pattern library below is the standard public grok core set).  A grok
expression like ``%{TIMESTAMP_ISO8601:ts} level=%{LOGLEVEL:level}``
compiles to a regex with named capture groups usable with
``pyarrow.compute.extract_regex``.
"""

from __future__ import annotations

import re

# Public core grok patterns (subset sufficient for log parsing).
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NONNEGINT": r"\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "LOGLEVEL": r"(?:[Tt]race|TRACE|[Dd]ebug|DEBUG|[Ii]nfo|INFO|[Nn]otice|NOTICE|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE)",
    "YEAR": r"\d{4}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:0?[1-9]|[12]\d|3[01])",
    "HOUR": r"(?:[01]?\d|2[0-3])",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]?\d)(?:\.\d+)?",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IPORHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|[\w.-]+)",
    "HOSTNAME": r"[\w.-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "QS": r"\"(?:[^\"\\]|\\.)*\"",
    "QUOTEDSTRING": r"\"(?:[^\"\\]|\\.)*\"",
    "PATH": r"(?:/[\w.-]+)+",
    "URIPATH": r"(?:/[\w.;=~-]*)+",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?\}")


def grok_to_regex(pattern: str, extra: dict[str, str] | None = None) -> str:
    """Expand %{NAME:field} references into a named-group regex."""
    lib = dict(GROK_PATTERNS)
    if extra:
        lib.update(extra)

    def sub(m: re.Match) -> str:
        name, field = m.group(1), m.group(2)
        if name not in lib:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        body = grok_to_regex(lib[name], extra) if "%{" in lib[name] else lib[name]
        if field:
            safe = re.sub(r"\W", "_", field)
            return f"(?P<{safe}>{body})"
        return f"(?:{body})"

    return _GROK_REF.sub(sub, pattern)
