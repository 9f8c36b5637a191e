from .mesh import make_mesh, shard_batch, data_axis_name

__all__ = ["make_mesh", "shard_batch", "data_axis_name"]
