from vector_ray.stages.remap import remap, RemapResult
from vector_ray.stages.filter import filter_stage
from vector_ray.stages.route import route, exclusive_route, RouteResult

__all__ = [
    "remap",
    "RemapResult",
    "filter_stage",
    "route",
    "exclusive_route",
    "RouteResult",
]
