from vector_ray.functions.grok import grok_to_regex, GROK_PATTERNS
from vector_ray.functions.parse import (
    parse_regex,
    parse_grok,
    parse_json_fields,
    parse_key_value,
    parse_timestamp,
    parse_int,
    parse_float,
    extract_regex_masked,
)
from vector_ray.functions import (  # noqa: F401 — function families
    codecs,
    collections,
    datetime_fns,
    ip,
    parse_logs,
    strings,
)

__all__ = [
    "grok_to_regex",
    "GROK_PATTERNS",
    "parse_regex",
    "parse_grok",
    "parse_json_fields",
    "parse_key_value",
    "parse_timestamp",
    "parse_int",
    "parse_float",
    "extract_regex_masked",
    "codecs",
    "collections",
    "datetime_fns",
    "ip",
    "parse_logs",
    "strings",
]
