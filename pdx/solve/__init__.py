"""pdx.solve — sparse-regression engines (L4), Gram-based and batched.

The canonical solver operates on sufficient statistics so hyperparameter
grids, bootstrap ensembles, and patch grids are single vmapped batched solves
(see SURVEY §2.9 parallel axes)."""

from pdx.solve.stridge import (
    stridge_from_stats,
    stridge,
    stridge_grid,
    StridgeResult,
)
from pdx.solve.robust import (
    irls_huber,
    stridge_huber,
    trimmed_stridge,
    stridge_sign_constrained,
    ensemble_stridge,
    robust_stridge,
)
from pdx.solve.lasso import lasso_ista

__all__ = [
    "stridge_from_stats",
    "stridge",
    "stridge_grid",
    "StridgeResult",
    "irls_huber",
    "stridge_huber",
    "trimmed_stridge",
    "stridge_sign_constrained",
    "ensemble_stridge",
    "robust_stridge",
    "lasso_ista",
]
