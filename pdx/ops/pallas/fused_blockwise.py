"""Fused blockwise-average + Gram accumulation kernel.

The blockwise dataset (the paper's flagship noise-robustness trick,
ks2d_stridge_benchmark.py:358-401, 8x error reduction at 5% noise) averages
u_t and every KS library term over (block_t x block_x x block_y) blocks
before the regression. The XLA path (library/blockwise.py) materializes the
(p, T, H, W) term stack, pads, reshapes, and mean-reduces — p+1 extra full
trajectory copies through HBM.

This kernel streams one temporal block (block_t frames) of U/Ut through VMEM
per grid step and fuses the whole chain on-chip:

  1. periodic stencil terms lap / bih / |grad u|^2 per frame (VPU),
  2. temporal block sum (reduction over the block_t axis),
  3. spatial block sums as TWO small MXU GEMMs per field against constant
     0/1 selector matrices  Px (nbx, H) and Py (W, nby):
         bs = Px @ ts @ Py
     (a reshape-free formulation — Mosaic cannot reshape (H, W) into
     (nbx, bx, nby, by) block axes, and the MXU does this for free),
  4. ragged-tail-exact normalization by the separable valid-cell count
     n_valid_t(step) * cnt_sp, and
  5. Gram/moment accumulation over the block-mean rows:
         G += B^T B,  b += B^T y,  sx, sy, syy
     (p = 3: scalar accumulators, same layout as fused_gram).

HBM traffic: U and Ut read once, O(p^2) bytes written — vs the XLA path's
~(p+2)x trajectory materialization plus pad/reshape copies.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from pdx.ops.pallas.fused_gram import HAS_PALLAS, _ks_terms_2d, _term_fields

if HAS_PALLAS:
    from jax.experimental import pallas as pl


def fused_blockwise_gram_reference(
    U: Array, Ut: Array, dx: float, dy: float, *, block_t: int, block_x: int, block_y: int
) -> dict[str, Array]:
    """XLA-composed reference: full term materialization + blockwise builder
    + Gram (the thing the kernel avoids)."""
    from pdx.library.blockwise import build_blockwise_dataset
    from pdx.ops.linalg import gram_stats

    lap, bih, gsq = _ks_terms_2d(U, dx, dy)
    terms = jnp.stack([lap, bih, gsq], axis=0)
    X, y = build_blockwise_dataset(
        Ut, terms, block_t=block_t, block_x=block_x, block_y=block_y
    )
    return gram_stats(X, y)


def _kernel(u_ref, ut_ref, px_ref, py_ref, cnt_ref, *out_refs, dx: float, dy: float,
            T: int, block_t: int):
    """One temporal block: terms -> t-sum -> spatial GEMM block-sums ->
    block means -> 14 scalar sufficient statistics (fused_gram layout:
    G00 G01 G02 G11 G12 G22 b0 b1 b2 sx0 sx1 sx2 sy syy)."""
    step = pl.program_id(0)
    u = u_ref[...]
    ut = ut_ref[...]
    px = px_ref[...]  # (nbx, H)
    py = py_ref[...]  # (W, nby)
    cnt_sp = cnt_ref[...]  # (nbx, nby) valid spatial cells per block

    lap, bih, gsq = _ks_terms_2d(u, dx, dy)

    # ragged temporal tail: zero-padded frames contribute zero to the sums;
    # the normalizer uses the true frame count of this block
    n_valid = jnp.minimum(block_t, T - step * block_t).astype(u.dtype)
    norm = 1.0 / (cnt_sp * n_valid)

    def block_means(f):
        ts = jnp.sum(f, axis=0)  # (H, W)
        bs = jax.lax.dot(
            jax.lax.dot(px, ts, preferred_element_type=jnp.float32),
            py,
            preferred_element_type=jnp.float32,
        )  # (nbx, nby)
        return bs * norm

    m = [block_means(f) for f in (lap, bih, gsq)]
    my = block_means(ut)

    vals = (
        jnp.sum(m[0] * m[0]), jnp.sum(m[0] * m[1]), jnp.sum(m[0] * m[2]),
        jnp.sum(m[1] * m[1]), jnp.sum(m[1] * m[2]), jnp.sum(m[2] * m[2]),
        jnp.sum(m[0] * my), jnp.sum(m[1] * my), jnp.sum(m[2] * my),
        jnp.sum(m[0]), jnp.sum(m[1]), jnp.sum(m[2]),
        jnp.sum(my), jnp.sum(my * my),
    )

    @pl.when(step == 0)
    def _():
        for ref in out_refs:
            ref[...] = jnp.zeros_like(ref)

    for ref, v in zip(out_refs, vals):
        ref[...] += v.reshape(1, 1)


def _kernel_terms(u_ref, ut_ref, px_ref, py_ref, cnt_ref, *out_refs, dx: float,
                  dy: float, T: int, block_t: int, names: tuple[str, ...]):
    """Generic-term-list variant of :func:`_kernel`: p(p+1)/2 + 2p + 2
    scalar statistics over the block-mean rows of the named term fields."""
    step = pl.program_id(0)
    u = u_ref[...]
    ut = ut_ref[...]
    px = px_ref[...]
    py = py_ref[...]
    cnt_sp = cnt_ref[...]

    fields = _term_fields(u, dx, dy, names)
    if "one" in names:
        # every other supported term vanishes on a zero-padded frame; the
        # constant field does not — mask padded frames out of its block sums
        tidx = jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
        valid = (step * block_t + tidx) < T
        oi = names.index("one")
        fields[oi] = jnp.where(valid, fields[oi], jnp.zeros_like(u))

    n_valid = jnp.minimum(block_t, T - step * block_t).astype(u.dtype)
    norm = 1.0 / (cnt_sp * n_valid)

    def block_means(f):
        ts = jnp.sum(f, axis=0)
        bs = jax.lax.dot(
            jax.lax.dot(px, ts, preferred_element_type=jnp.float32),
            py,
            preferred_element_type=jnp.float32,
        )
        return bs * norm

    m = [block_means(f) for f in fields]
    my = block_means(ut)
    p = len(m)

    vals = []
    for i in range(p):
        for j in range(i, p):
            vals.append(jnp.sum(m[i] * m[j]))
    vals += [jnp.sum(mi * my) for mi in m]
    vals += [jnp.sum(mi) for mi in m]
    vals += [jnp.sum(my), jnp.sum(my * my)]

    @pl.when(step == 0)
    def _():
        for ref in out_refs:
            ref[...] = jnp.zeros_like(ref)

    for ref, v in zip(out_refs, vals):
        ref[...] += v.reshape(1, 1)


def fused_blockwise_gram_terms_reference(
    U: Array, Ut: Array, dx: float, dy: float, *, names: tuple[str, ...],
    block_t: int, block_x: int, block_y: int
) -> dict[str, Array]:
    """XLA-composed reference for the generic term list."""
    from pdx.library.blockwise import build_blockwise_dataset
    from pdx.ops.linalg import gram_stats

    terms = jnp.stack(_term_fields(U, dx, dy, tuple(names)), axis=0)
    X, y = build_blockwise_dataset(
        Ut, terms, block_t=block_t, block_x=block_x, block_y=block_y
    )
    return gram_stats(X, y)


@partial(jax.jit, static_argnames=("dx", "dy", "names", "block_t", "block_x",
                                   "block_y", "interpret"))
def fused_blockwise_gram_terms(
    U: Array,
    Ut: Array,
    *,
    dx: float,
    dy: float,
    names: tuple[str, ...],
    block_t: int = 3,
    block_x: int = 8,
    block_y: int = 8,
    interpret: bool | None = None,
) -> dict[str, Array]:
    """Streaming blockwise Gram for an arbitrary stencil term list (the rich
    9-term KS library and subsets) — :func:`fused_blockwise_gram`'s
    structure, :func:`~pdx.ops.pallas.fused_gram._term_fields` vocabulary."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not HAS_PALLAS:
        return fused_blockwise_gram_terms_reference(
            U, Ut, dx, dy, names=names, block_t=block_t, block_x=block_x,
            block_y=block_y,
        )
    T, H, W = U.shape
    bt = int(block_t)
    p = len(names)
    dtype = jnp.float32
    U = U.astype(dtype)
    Ut = Ut.astype(dtype)
    pad_t = (-T) % bt
    if pad_t:
        zeros = jnp.zeros((pad_t, H, W), dtype)
        U = jnp.concatenate([U, zeros], axis=0)
        Ut = jnp.concatenate([Ut, zeros], axis=0)
    n_blocks_t = (T + pad_t) // bt

    Px, Py, cnt_sp = _selectors(H, W, int(block_x), int(block_y))
    nbx, nby = Px.shape[0], Py.shape[1]

    kernel = partial(_kernel_terms, dx=dx, dy=dy, T=T, block_t=bt, names=tuple(names))
    n_out = p * (p + 1) // 2 + 2 * p + 2
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks_t,),
        in_specs=[
            pl.BlockSpec((bt, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((nbx, H), lambda i: (0, 0)),
            pl.BlockSpec((W, nby), lambda i: (0, 0)),
            pl.BlockSpec((nbx, nby), lambda i: (0, 0)),
        ],
        out_specs=tuple(pl.BlockSpec((1, 1), lambda i: (0, 0)) for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((1, 1), dtype) for _ in range(n_out)),
        interpret=interpret,
    )(U, Ut, jnp.asarray(Px), jnp.asarray(Py), jnp.asarray(cnt_sp))
    flat = [o[0, 0] for o in outs]
    ntri = p * (p + 1) // 2
    tri = flat[:ntri]
    b = jnp.stack(flat[ntri : ntri + p])
    sx = jnp.stack(flat[ntri + p : ntri + 2 * p])
    sy, syy = flat[-2], flat[-1]
    G = jnp.zeros((p, p), dtype)
    k = 0
    for i in range(p):
        for j in range(i, p):
            G = G.at[i, j].set(tri[k])
            G = G.at[j, i].set(tri[k])
            k += 1
    return {
        "G": G,
        "b": b,
        "sx": sx,
        "n": jnp.asarray(n_blocks_t * nbx * nby, dtype),
        "syy": syy,
        "sy": sy,
    }


def _selectors(H: int, W: int, bx: int, by: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """0/1 spatial block-sum selectors Px (nbx, H), Py (W, nby) and the
    separable valid-cell count matrix (nbx, nby)."""
    nbx, nby = -(-H // bx), -(-W // by)
    Px = np.zeros((nbx, H), np.float32)
    for i in range(nbx):
        Px[i, i * bx : min((i + 1) * bx, H)] = 1.0
    Py = np.zeros((W, nby), np.float32)
    for j in range(nby):
        Py[j * by : min((j + 1) * by, W), j] = 1.0
    vx = Px.sum(axis=1)
    vy = Py.sum(axis=0)
    return Px, Py, np.outer(vx, vy).astype(np.float32)


@partial(jax.jit, static_argnames=("dx", "dy", "block_t", "block_x", "block_y", "interpret"))
def fused_blockwise_gram(
    U: Array,
    Ut: Array,
    *,
    dx: float,
    dy: float,
    block_t: int = 3,
    block_x: int = 8,
    block_y: int = 8,
    interpret: bool | None = None,
) -> dict[str, Array]:
    """Streaming blockwise Gram for the true KS library [lap, bih, gradsq].

    U and Ut are (T, H, W) aligned frame stacks. Returns the gram_stats dict
    of the blockwise dataset — bit-comparable (f32 accumulation noise) to
    fused_blockwise_gram_reference. Grid: one program per temporal block
    (the blockwise block IS the streaming unit, so ragged handling matches
    build_blockwise_dataset's min(T, t0+bt) slicing exactly).

    ``interpret=None`` resolves at trace time: compiled Mosaic on TPU,
    interpreter elsewhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not HAS_PALLAS:
        return fused_blockwise_gram_reference(
            U, Ut, dx, dy, block_t=block_t, block_x=block_x, block_y=block_y
        )
    T, H, W = U.shape
    bt = int(block_t)
    dtype = jnp.float32
    U = U.astype(dtype)
    Ut = Ut.astype(dtype)
    pad_t = (-T) % bt
    if pad_t:
        zeros = jnp.zeros((pad_t, H, W), dtype)
        U = jnp.concatenate([U, zeros], axis=0)
        Ut = jnp.concatenate([Ut, zeros], axis=0)
    n_blocks_t = (T + pad_t) // bt

    Px, Py, cnt_sp = _selectors(H, W, int(block_x), int(block_y))
    nbx, nby = Px.shape[0], Py.shape[1]

    kernel = partial(_kernel, dx=dx, dy=dy, T=T, block_t=bt)
    n_out = 14
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks_t,),
        in_specs=[
            pl.BlockSpec((bt, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((bt, H, W), lambda i: (i, 0, 0)),
            pl.BlockSpec((nbx, H), lambda i: (0, 0)),
            pl.BlockSpec((W, nby), lambda i: (0, 0)),
            pl.BlockSpec((nbx, nby), lambda i: (0, 0)),
        ],
        out_specs=tuple(pl.BlockSpec((1, 1), lambda i: (0, 0)) for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((1, 1), dtype) for _ in range(n_out)),
        interpret=interpret,
    )(U, Ut, jnp.asarray(Px), jnp.asarray(Py), jnp.asarray(cnt_sp))
    (g00, g01, g02, g11, g12, g22, b0, b1, b2, s0, s1, s2, sy, syy) = [
        o[0, 0] for o in outs
    ]

    G = jnp.stack(
        [jnp.stack([g00, g01, g02]), jnp.stack([g01, g11, g12]), jnp.stack([g02, g12, g22])]
    )
    n = jnp.asarray(n_blocks_t * nbx * nby, dtype)
    return {
        "G": G,
        "b": jnp.stack([b0, b1, b2]),
        "sx": jnp.stack([s0, s1, s2]),
        "n": n,
        "syy": syy,
        "sy": sy,
    }
