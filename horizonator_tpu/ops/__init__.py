from .viewshed import (viewshed_polar, viewshed_grid, viewshed_sweep,
                       horizon_sweep)

__all__ = ["viewshed_polar", "viewshed_grid", "viewshed_sweep",
           "horizon_sweep"]
