from vector_ray.functions.grok import grok_to_regex, GROK_PATTERNS
from vector_ray.functions.parse import (
    parse_regex,
    parse_grok,
    parse_json_fields,
    parse_key_value,
    parse_timestamp,
)

__all__ = [
    "grok_to_regex",
    "GROK_PATTERNS",
    "parse_regex",
    "parse_grok",
    "parse_json_fields",
    "parse_key_value",
    "parse_timestamp",
]
