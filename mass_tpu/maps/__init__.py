from mass_tpu.maps.layers import (  # noqa: F401
    OccupancyMap, SemanticMap, FeatureMap, ClipMap, MapSet)
