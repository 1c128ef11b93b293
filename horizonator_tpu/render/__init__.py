from .raymarch import (RenderParams, render_panorama, horizon_profile,
                       march_tanel)
from .texture import AtlasParams, sample_atlas_bgr, tile_xy_from_latlon

__all__ = [
    "RenderParams", "render_panorama", "horizon_profile", "march_tanel",
    "AtlasParams", "sample_atlas_bgr", "tile_xy_from_latlon",
]
