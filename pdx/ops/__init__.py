"""pdx.ops — L0 numerics primitives.

Pure jittable functions. All 2-D operators act on the trailing two axes of
``(..., H, W)`` arrays so a single call covers a whole time/patch batch
(replaces the per-frame Python loops of the reference scripts).
"""

from pdx.ops.fd import (
    gradients_periodic,
    laplacian_periodic,
    biharmonic_periodic,
    gradients_central_interior,
    derivs_2d_reflect,
    gradients_4th_order,
)
from pdx.ops.spectral import (
    spectral_wavenumbers,
    spectral_mask,
    gradients_spectral,
    laplacian_spectral,
    gaussian_smooth_periodic,
)
from pdx.ops.filters import (
    time_smooth_moving_average,
    smooth_1d,
    gaussian_filter_reflect,
    savgol_time,
    median_filter_3x3,
    tv_denoise,
)
from pdx.ops.metrics import (
    rmse,
    r2_score,
    nrmse,
    mae,
    pearson_corr,
    regression_metrics,
)
from pdx.ops.linalg import (
    ridge_solve,
    masked_ridge_solve,
    column_standardize_stats,
)
from pdx.ops.interp import (
    bilinear_sample_periodic,
    bilinear_sample_reflect,
    shift_periodic,
    shift_reflect,
    remap_bilinear,
    resize_area,
    resize_bilinear,
)

__all__ = [
    "gradients_periodic",
    "laplacian_periodic",
    "biharmonic_periodic",
    "gradients_central_interior",
    "derivs_2d_reflect",
    "gradients_4th_order",
    "spectral_wavenumbers",
    "spectral_mask",
    "gradients_spectral",
    "laplacian_spectral",
    "gaussian_smooth_periodic",
    "time_smooth_moving_average",
    "smooth_1d",
    "gaussian_filter_reflect",
    "savgol_time",
    "median_filter_3x3",
    "tv_denoise",
    "rmse",
    "r2_score",
    "nrmse",
    "mae",
    "pearson_corr",
    "regression_metrics",
    "ridge_solve",
    "masked_ridge_solve",
    "column_standardize_stats",
    "bilinear_sample_periodic",
    "bilinear_sample_reflect",
    "shift_periodic",
    "shift_reflect",
    "remap_bilinear",
    "resize_area",
    "resize_bilinear",
]
