from .mesh import make_mesh, shard_params_tp, replicate

__all__ = ["make_mesh", "shard_params_tp", "replicate"]
