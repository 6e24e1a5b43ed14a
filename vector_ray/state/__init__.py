from vector_ray.state.manifest import RunManifest, sink_manifest_path

__all__ = ["RunManifest", "sink_manifest_path"]
