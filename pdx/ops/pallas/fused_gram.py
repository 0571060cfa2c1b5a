"""Fused KS dictionary + Gram accumulation kernel.

The pointwise KS pipeline's memory traffic is dominated by materializing the
term stack Theta = [lap, bih, |grad u|^2, ...] for every frame ((p+2) full
trajectory copies through HBM) before one big GEMM. This kernel streams
frame-blocks through VMEM once: for each block it computes the periodic
stencil terms on-chip, flattens them, and accumulates

    G += Theta_blk^T Theta_blk      (p x p, MXU)
    b += Theta_blk^T ut_blk
    sx += column sums, n, syy, sy

so the only HBM traffic is reading U (and Ut) once and writing O(p^2) bytes.

Grid: one program per frame-block; TPU grid execution is sequential, so the
accumulator outputs are revisited with `+=` across steps (guarded init at
step 0). Layout: frames are flattened to rows of a (bt, H*W) tile — W=100
grids pad the lane dimension to 128 inside the block.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

try:  # pallas import is TPU/CPU-interpret capable; guard for safety
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _ks_terms_2d(u: Array, dx: float, dy: float) -> tuple[Array, Array, Array]:
    """lap, bih, |grad u|^2 with periodic rolls on the trailing two axes."""
    lap = (
        (jnp.roll(u, -1, -2) - 2 * u + jnp.roll(u, 1, -2)) / (dx * dx)
        + (jnp.roll(u, -1, -1) - 2 * u + jnp.roll(u, 1, -1)) / (dy * dy)
    )
    bih = (
        (jnp.roll(lap, -1, -2) - 2 * lap + jnp.roll(lap, 1, -2)) / (dx * dx)
        + (jnp.roll(lap, -1, -1) - 2 * lap + jnp.roll(lap, 1, -1)) / (dy * dy)
    )
    gx = (jnp.roll(u, -1, -2) - jnp.roll(u, 1, -2)) / (2 * dx)
    gy = (jnp.roll(u, -1, -1) - jnp.roll(u, 1, -1)) / (2 * dy)
    return lap, bih, gx * gx + gy * gy


def fused_ks_gram_reference(U: Array, Ut: Array, dx: float, dy: float) -> dict[str, Array]:
    """XLA-composed reference: full term materialization + GEMM (the thing
    the kernel avoids). Returns the gram_stats dict for [lap, bih, gradsq]."""
    lap, bih, gsq = _ks_terms_2d(U, dx, dy)
    T = U.shape[0]
    X = jnp.stack([lap.reshape(T, -1), bih.reshape(T, -1), gsq.reshape(T, -1)], axis=-1)
    X = X.reshape(-1, 3)
    y = Ut.reshape(-1)
    return {
        "G": X.T @ X,
        "b": X.T @ y,
        "sx": jnp.sum(X, axis=0),
        "n": jnp.asarray(X.shape[0], X.dtype),
        "syy": jnp.sum(y * y),
        "sy": jnp.sum(y),
    }


def _kernel(u_ref, ut_ref, *out_refs, dx: float, dy: float):
    """Accumulate the 14 scalar sufficient statistics.

    Output order: G00 G01 G02 G11 G12 G22 b0 b1 b2 sx0 sx1 sx2 sy syy —
    each a (1, 1) accumulator. Mosaic cannot reshape the (bt, H, W) fields
    into a flat design matrix, so the Gram entries are computed directly as
    elementwise-product reductions on the VPU (p=3: there is no MXU win to
    be had; the kernel's value is one-pass HBM streaming).
    """
    step = pl.program_id(0)
    u = u_ref[...]
    ut = ut_ref[...]
    lap, bih, gsq = _ks_terms_2d(u, dx, dy)

    vals = (
        jnp.sum(lap * lap), jnp.sum(lap * bih), jnp.sum(lap * gsq),
        jnp.sum(bih * bih), jnp.sum(bih * gsq), jnp.sum(gsq * gsq),
        jnp.sum(lap * ut), jnp.sum(bih * ut), jnp.sum(gsq * ut),
        jnp.sum(lap), jnp.sum(bih), jnp.sum(gsq),
        jnp.sum(ut), jnp.sum(ut * ut),
    )

    @pl.when(step == 0)
    def _():
        for ref in out_refs:
            ref[...] = jnp.zeros_like(ref)

    for ref, v in zip(out_refs, vals):
        ref[...] += v.reshape(1, 1)


# ---------------------------------------------------------------------------
# Generic term-list variant: same streaming structure for ANY dictionary whose
# terms are periodic stencils / pointwise maps of u (the rich 9-term KS
# library of ks2d_stridge_benchmark.py:1017-1060 and its advection/no-
# advection subsets). The proven 3-term kernel above is kept verbatim — it is
# the battery-measured flagship; this generalization extends coverage without
# touching it.
# ---------------------------------------------------------------------------

RICH_TERM_NAMES = ("one", "u", "u2", "ux", "uy", "lap", "bih", "gradsq", "u_lap")


def _term_fields(u: Array, dx: float, dy: float, names: tuple[str, ...]) -> list[Array]:
    """Compute the named periodic-stencil term fields of a frame block.

    Shared intermediates (gradients, laplacian) are built once and reused;
    only fields a requested term needs are materialized in VMEM.
    """
    need = set(names)
    ux = uy = lap = bih = None
    if need & {"ux", "uy", "gradsq"}:
        ux = (jnp.roll(u, -1, -2) - jnp.roll(u, 1, -2)) / (2 * dx)
        uy = (jnp.roll(u, -1, -1) - jnp.roll(u, 1, -1)) / (2 * dy)
    if need & {"lap", "bih", "u_lap"}:
        lap = (
            (jnp.roll(u, -1, -2) - 2 * u + jnp.roll(u, 1, -2)) / (dx * dx)
            + (jnp.roll(u, -1, -1) - 2 * u + jnp.roll(u, 1, -1)) / (dy * dy)
        )
    if "bih" in need:
        bih = (
            (jnp.roll(lap, -1, -2) - 2 * lap + jnp.roll(lap, 1, -2)) / (dx * dx)
            + (jnp.roll(lap, -1, -1) - 2 * lap + jnp.roll(lap, 1, -1)) / (dy * dy)
        )
    built = {
        "one": lambda: jnp.ones_like(u),
        "u": lambda: u,
        "u2": lambda: u * u,
        "ux": lambda: ux,
        "uy": lambda: uy,
        "lap": lambda: lap,
        "bih": lambda: bih,
        "gradsq": lambda: ux * ux + uy * uy,
        "u_lap": lambda: u * lap,
    }
    return [built[n]() for n in names]


def _kernel_terms(u_ref, ut_ref, *out_refs, dx: float, dy: float, names: tuple[str, ...]):
    """Accumulate p(p+1)/2 + 2p + 2 scalar sufficient statistics for the
    named term list: Gram upper triangle (row-major i<=j), b, sx, sy, syy."""
    step = pl.program_id(0)
    u = u_ref[...]
    ut = ut_ref[...]
    fields = _term_fields(u, dx, dy, names)
    p = len(fields)

    vals = []
    for i in range(p):
        for j in range(i, p):
            vals.append(jnp.sum(fields[i] * fields[j]))
    vals += [jnp.sum(f * ut) for f in fields]
    vals += [jnp.sum(f) for f in fields]
    vals += [jnp.sum(ut), jnp.sum(ut * ut)]

    @pl.when(step == 0)
    def _():
        for ref in out_refs:
            ref[...] = jnp.zeros_like(ref)

    for ref, v in zip(out_refs, vals):
        ref[...] += v.reshape(1, 1)


@partial(jax.jit, static_argnames=("dx", "dy", "names", "block_t", "interpret"))
def fused_ks_gram_terms(
    U: Array,
    Ut: Array,
    *,
    dx: float,
    dy: float,
    names: tuple[str, ...] = RICH_TERM_NAMES,
    block_t: int = 8,
    interpret: bool | None = None,
) -> dict[str, Array]:
    """Streaming dictionary+Gram for an arbitrary periodic-stencil term list
    (default: the rich 9-term KS library). Same one-pass HBM structure as
    :func:`fused_ks_gram`; zero-frame padding stays exact because every
    supported term except ``one`` vanishes on a zero frame, and the ``one``
    rows' statistics are corrected in closed form below.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not HAS_PALLAS:
        return _terms_reference(U, Ut, dx, dy, names)
    T, H, W = U.shape
    p = len(names)
    # VMEM guard, scaled by live-field count (p terms + u/ut + ~3
    # intermediates, double-buffered inputs): keep the block's working set
    # well under the 16 MB scoped-vmem limit
    budget_elems = (6 * 1024 * 1024) // (4 * (p + 5))
    block_t = max(1, min(block_t, budget_elems // (H * W) or 1))
    dtype = jnp.float32
    U = U.astype(dtype)
    Ut = Ut.astype(dtype)
    pad_t = (-T) % block_t
    if pad_t:
        zeros = jnp.zeros((pad_t, H, W), dtype)
        U = jnp.concatenate([U, zeros], axis=0)
        Ut = jnp.concatenate([Ut, zeros], axis=0)
    n_blocks = (T + pad_t) // block_t

    kernel = partial(_kernel_terms, dx=dx, dy=dy, names=tuple(names))
    n_out = p * (p + 1) // 2 + 2 * p + 2
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_t, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_t, H, W), lambda i: (i, 0, 0)),
        ],
        out_specs=tuple(pl.BlockSpec((1, 1), lambda i: (0, 0)) for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((1, 1), dtype) for _ in range(n_out)),
        interpret=interpret,
    )(U, Ut)
    flat = [o[0, 0] for o in outs]
    tri = flat[: p * (p + 1) // 2]
    b = jnp.stack(flat[p * (p + 1) // 2 : p * (p + 1) // 2 + p])
    sx = jnp.stack(flat[p * (p + 1) // 2 + p : p * (p + 1) // 2 + 2 * p])
    sy, syy = flat[-2], flat[-1]

    G = jnp.zeros((p, p), dtype)
    k = 0
    for i in range(p):
        for j in range(i, p):
            G = G.at[i, j].set(tri[k])
            G = G.at[j, i].set(tri[k])
            k += 1
    n_true = T * H * W
    if pad_t and "one" in names:
        # zero-padding correction: the 'one' field does NOT vanish on padded
        # frames. Every padded-frame contribution involving 'one' is a sum of
        # (other term on a zero frame) = 0, EXCEPT <one, one> which overcounts
        # by exactly the padded sample count. b/sx/sy/syy involve ut or
        # non-constant terms (zero on padding) or 'one' itself (sx correction
        # equals the same count).
        oi = names.index("one")
        extra = jnp.asarray(pad_t * H * W, dtype)
        G = G.at[oi, oi].add(-extra)
        sx = sx.at[oi].add(-extra)
    return {
        "G": G,
        "b": b,
        "sx": sx,
        "n": jnp.asarray(n_true, dtype),
        "syy": syy,
        "sy": sy,
    }


def _terms_reference(U: Array, Ut: Array, dx: float, dy: float, names: tuple[str, ...]) -> dict[str, Array]:
    """XLA-composed reference: materialize the named terms + GEMM."""
    fields = _term_fields(U, dx, dy, tuple(names))
    T = U.shape[0]
    X = jnp.stack([f.reshape(T, -1) for f in fields], axis=-1).reshape(-1, len(names))
    y = Ut.reshape(-1)
    return {
        "G": X.T @ X,
        "b": X.T @ y,
        "sx": jnp.sum(X, axis=0),
        "n": jnp.asarray(X.shape[0], X.dtype),
        "syy": jnp.sum(y * y),
        "sy": jnp.sum(y),
    }


@partial(jax.jit, static_argnames=("dx", "dy", "block_t", "interpret"))
def fused_ks_gram(
    U: Array,
    Ut: Array,
    *,
    dx: float,
    dy: float,
    block_t: int = 8,
    interpret: bool | None = None,
) -> dict[str, Array]:
    """Streaming dictionary+Gram for the true KS library [lap, bih, gradsq].

    U and Ut are (T, H, W) aligned frame stacks (non-divisible T is
    zero-frame padded — exact, see below). float32 compute.

    ``interpret=None`` resolves at trace time: compiled Mosaic on TPU,
    interpreter elsewhere (CPU has no Mosaic backend).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not HAS_PALLAS:
        return fused_ks_gram_reference(U, Ut, dx, dy)
    T, H, W = U.shape
    # VMEM guard: keep each block under ~1 MB/f32 field (the kernel holds
    # ~10 live fields + double-buffered inputs; >=40-frame 100x100 blocks
    # exceeded the 16 MB scoped-vmem limit on v5e)
    block_t = max(1, min(block_t, (256 * 1024) // (H * W) or 1))
    dtype = jnp.float32
    U = U.astype(dtype)
    Ut = Ut.astype(dtype)
    pad_t = (-T) % block_t
    if pad_t:
        # Exact: the stencils are purely spatial, so an all-zero frame
        # contributes zero to every accumulated statistic; n is set from the
        # true T below.
        zeros = jnp.zeros((pad_t, H, W), dtype)
        U = jnp.concatenate([U, zeros], axis=0)
        Ut = jnp.concatenate([Ut, zeros], axis=0)
    n_blocks = (T + pad_t) // block_t

    kernel = partial(_kernel, dx=dx, dy=dy)
    n_out = 14
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_t, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_t, H, W), lambda i: (i, 0, 0)),
        ],
        out_specs=tuple(pl.BlockSpec((1, 1), lambda i: (0, 0)) for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((1, 1), dtype) for _ in range(n_out)),
        interpret=interpret,
    )(U, Ut)
    (g00, g01, g02, g11, g12, g22, b0, b1, b2, s0, s1, s2, sy, syy) = [o[0, 0] for o in outs]

    G = jnp.stack(
        [jnp.stack([g00, g01, g02]), jnp.stack([g01, g11, g12]), jnp.stack([g02, g12, g22])]
    )
    n = jnp.asarray(T * H * W, dtype)
    return {
        "G": G,
        "b": jnp.stack([b0, b1, b2]),
        "sx": jnp.stack([s0, s1, s2]),
        "n": n,
        "syy": syy,
        "sy": sy,
    }
