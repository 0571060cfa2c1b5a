"""Host-memory allocation helpers.

This class of host (nested-virtualized single-core VM) charges ~0.5 ms per
4 kB first-touch page fault: filling a freshly allocated 267 MB numpy block
costs ~13-33 s before a single byte of real work happens. Transparent huge
pages are configured `madvise`-gated here, and `madvise(MADV_HUGEPAGE)` on
the buffer BEFORE first touch collapses the faults 512-fold — measured
2026-08-18: a (51, 1024, 1280) f32 fill drops 12.8 s -> 0.17 s (75x).
`GLIBC_TUNABLES=glibc.malloc.hugetlb=1` does NOT reach numpy's buffers
(verified) — the explicit madvise is the only working lever.

Every host staging buffer on a hot path (image stacks, large RNG fields)
should come from :func:`huge_empty` instead of bare ``np.empty``.
"""

from __future__ import annotations

import ctypes
import sys

import numpy as np

_MADV_HUGEPAGE = 14
_libc = None
if sys.platform.startswith("linux"):
    try:
        _libc = ctypes.CDLL("libc.so.6", use_errno=True)
    except OSError:  # pragma: no cover - exotic libc layouts
        _libc = None


def madvise_hugepages(arr: np.ndarray) -> np.ndarray:
    """Best-effort ``madvise(MADV_HUGEPAGE)`` on an array's buffer.

    Call immediately after allocation, BEFORE first touch — the advice
    changes how the kernel populates the pages at fault time. No-op (and
    harmless) off Linux, on failure, or for small/non-owning arrays.
    """
    if _libc is None or arr.nbytes < (1 << 21):  # < one 2 MB huge page
        return arr
    try:
        addr = arr.__array_interface__["data"][0]
        off = addr % 4096
        _libc.madvise(
            ctypes.c_void_p(addr - off),
            ctypes.c_size_t(arr.nbytes + off),
            _MADV_HUGEPAGE,
        )
    except Exception:  # advisory only: the array is valid either way
        pass
    return arr


def huge_empty(shape, dtype) -> np.ndarray:
    """``np.empty`` whose pages fault in as huge pages (see module doc)."""
    return madvise_hugepages(np.empty(shape, dtype))
