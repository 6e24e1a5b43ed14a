from vector_ray.stages.remap import remap, RemapResult
from vector_ray.stages.filter import filter_stage
from vector_ray.stages.route import route, exclusive_route, RouteResult
from vector_ray.stages.sample import sample_modulo, sample_hash
from vector_ray.stages.dedupe import dedupe_exact, dedupe_ignore, fingerprint
from vector_ray.stages.reduce import reduce_stage
from vector_ray.stages.aggregate import aggregate_stage
from vector_ray.stages.throttle import throttle_stage
from vector_ray.stages.cardinality import tag_cardinality_limit
from vector_ray.stages.log_metric import log_to_metric, metric_to_log, MetricSpec
from vector_ray.stages.hash_replace import hash_replace

__all__ = [
    "remap",
    "RemapResult",
    "filter_stage",
    "route",
    "exclusive_route",
    "RouteResult",
    "sample_modulo",
    "sample_hash",
    "dedupe_exact",
    "dedupe_ignore",
    "fingerprint",
    "reduce_stage",
    "aggregate_stage",
    "throttle_stage",
    "tag_cardinality_limit",
    "log_to_metric",
    "metric_to_log",
    "MetricSpec",
    "hash_replace",
]
