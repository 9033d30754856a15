from aphrodite_tpu.parallel.mesh import build_mesh, kv_cache_pspec

__all__ = ["build_mesh", "kv_cache_pspec"]
