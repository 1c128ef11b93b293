from .sharding import (stack_params, render_batch, horizon_batch,
                       make_sharded_renderer, make_sharded_horizon,
                       render_path)

__all__ = ["stack_params", "render_batch", "horizon_batch",
           "make_sharded_renderer", "make_sharded_horizon", "render_path"]
