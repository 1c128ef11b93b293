from .sharding import (stack_params, render_batch, horizon_batch,
                       make_sharded_renderer, make_sharded_horizon,
                       render_path)
from .regions import (make_region_sharded_horizon,
                      make_region_sharded_renderer)

__all__ = ["stack_params", "render_batch", "horizon_batch",
           "make_sharded_renderer", "make_sharded_horizon", "render_path",
           "make_region_sharded_horizon", "make_region_sharded_renderer"]
