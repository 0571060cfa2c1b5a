"""pdx.sim — synthetic data generation: KS-2D/1D simulators + perturbation suite."""

from pdx.sim.ks2d import Ks2dConfig, simulate_ks2d, ks_rhs
from pdx.sim.perturb import PerturbConfig, apply_perturbation_suite

__all__ = [
    "Ks2dConfig",
    "simulate_ks2d",
    "ks_rhs",
    "PerturbConfig",
    "apply_perturbation_suite",
]
