from .mesh import TILE_AXIS, make_mesh, replicated, tile_sharding
from .render import make_sharded_render_fn, make_sharded_render_raw

__all__ = ["make_mesh", "tile_sharding", "replicated", "TILE_AXIS",
           "make_sharded_render_fn", "make_sharded_render_raw"]
