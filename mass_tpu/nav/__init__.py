from mass_tpu.nav.grid import (  # noqa: F401
    NavGrid, navigable_area, build_nav_grid, refresh_nav_grid,
    distance_field, extract_path)
from mass_tpu.nav.controller import NavigationController  # noqa: F401
