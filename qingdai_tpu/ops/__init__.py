from .stencil import laplacian_sphere, hyperdiffuse, shapiro_filter, spectral_zonal_filter
from .advect import advect_semilag
from .smooth import gaussian_filter
from .reductions import area_mean, masked_median_of_positive

__all__ = [
    "laplacian_sphere", "hyperdiffuse", "shapiro_filter", "spectral_zonal_filter",
    "advect_semilag", "gaussian_filter", "area_mean", "masked_median_of_positive",
]
