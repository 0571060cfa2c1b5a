"""pdx.register — TPU-native image registration stack (L2).

Device-side replacements for the reference's OpenCV C++ primitives:
phase-correlation translation estimation (cv2.phaseCorrelate), dense
optical flow (Farnebäck / DIS), ECC parametric registration, and the warp
machinery in :mod:`pdx.ops.interp`.
"""

from pdx.register.phasecorr import (
    phase_correlate,
    estimate_shift_phasecorr,
    stabilize_translation_sequence,
    estimate_interframe_shifts,
)

__all__ = [
    "phase_correlate",
    "estimate_shift_phasecorr",
    "stabilize_translation_sequence",
    "estimate_interframe_shifts",
]
