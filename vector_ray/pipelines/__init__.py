from vector_ray.pipelines.flagship import (
    flagship_counts,
    parsed_transcripts,
    transcript_parse_program,
    GROK_LINE,
    GROK_REGEX,
    FLAGSHIP_ROUTES,
)

__all__ = [
    "flagship_counts",
    "parsed_transcripts",
    "transcript_parse_program",
    "GROK_LINE",
    "GROK_REGEX",
    "FLAGSHIP_ROUTES",
]
