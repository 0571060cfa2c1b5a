"""pdx.validate — holdouts, one-step / k-step rollout validation, selection (L5)."""

from pdx.validate.holdout import split_time, split_space_left_right, split_space_top_bottom
from pdx.validate.rollout import one_step_prediction_rmse, rollout_rmse_curve, rollout_k_rmse
from pdx.validate.selection import select_best, patch_stability_aggregate

__all__ = [
    "split_time",
    "split_space_left_right",
    "split_space_top_bottom",
    "one_step_prediction_rmse",
    "rollout_rmse_curve",
    "rollout_k_rmse",
    "select_best",
    "patch_stability_aggregate",
]
