from vector_ray.topology.config import Topology, ComponentSpec, ConfigError
from vector_ray.topology.runner import run_topology, RunResult, register_program

__all__ = [
    "Topology",
    "ComponentSpec",
    "ConfigError",
    "run_topology",
    "RunResult",
    "register_program",
]
