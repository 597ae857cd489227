from paradis_tpu.sphere.padding import geocyclic_pad
from paradis_tpu.sphere.geometry import (
    latitude_weights,
    lonlat_grids,
    normalized_inverse_lon_spacing,
    rotated_to_latlon,
)

__all__ = [
    "geocyclic_pad",
    "latitude_weights",
    "lonlat_grids",
    "normalized_inverse_lon_spacing",
    "rotated_to_latlon",
]
