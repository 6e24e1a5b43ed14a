from vector_ray.sources.text import read_log_lines, aggregate_multiline

__all__ = ["read_log_lines", "aggregate_multiline"]
