from vector_ray.state.manifest import RunManifest

__all__ = ["RunManifest"]
