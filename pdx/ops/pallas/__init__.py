"""pdx.ops.pallas — hand-written TPU kernels for the hot paths.

Kernels exist where XLA's automatic fusion leaves HBM bandwidth on the table:
the KS dictionary + Gram accumulation (avoids materializing the
(p, T, H, W) term stack — ~9x the trajectory size — in HBM), and blockwise
averaging. Every kernel has an XLA-composed reference implementation and a
parity test; callers fall back to the XLA path off-TPU.
"""

from pdx.ops.pallas.fused_gram import fused_ks_gram, fused_ks_gram_reference

__all__ = ["fused_ks_gram", "fused_ks_gram_reference"]
