from .viewshed import (viewshed_polar, viewshed_grid, viewshed_sweep,
                       horizon_sweep, viewshed_count)
from .shadows import shadow_light, sun_hours
from .los import sightline, intervisible, intervisibility_matrix, Sightline

__all__ = ["viewshed_polar", "viewshed_grid", "viewshed_sweep",
           "viewshed_count",
           "horizon_sweep", "shadow_light", "sun_hours",
           "sightline", "intervisible", "intervisibility_matrix",
           "Sightline"]
