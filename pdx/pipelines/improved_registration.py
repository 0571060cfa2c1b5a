"""Registration-method comparison pipeline (Farnebäck vs DIS) + 13-term SINDy.

End-to-end parity with ``scripts/pde_discovery_improved_registration.py``:
load -> denoise/normalize -> register with improved-parameter Farnebäck AND
DIS -> residual-flow quality metrics -> pick the better method ->
Savitzky-Golay temporal smoothing (window 7, poly 3) -> crop/subsample ->
sliced 2nd-order derivatives (same start-truncation quirk as analyze) ->
13-term library -> STRidge -> equation + metrics + slide-data artifacts.

TPU-native: the reference smooths the time series pixel-by-pixel in a Python
list comprehension over H*W pixels (:369-371) — here it is one batched
savgol pass. Both registrations and both quality metrics are batched
device programs.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from pdx.io_host.images import load_images
from pdx.io_host.artifacts import write_json
from pdx.ops.filters import gaussian_filter_reflect, savgol_time
from pdx.ops.metrics import r2_score
from pdx.ops.linalg import gram_stats
from pdx.ops.interp import warp_flow
from pdx.register.farneback import farneback_register_sequence
from pdx.register.dis import dis_flow
from pdx.register.quality import registration_improvement
from pdx.solve.stridge import stridge_from_stats

TERM_NAMES = [
    "1", "u", "u_x", "u_y", "u_xx", "u_yy", "lap(u)", "u^2", "u*u_x", "u*u_y", "u^3", "u_x^2", "u_y^2",
]


@dataclass(frozen=True)
class ImprovedRegistrationConfig:
    data_dir: str = "data/Real-Images"
    output_dir: str = "outputs/latest/registration"
    max_images: int = 51
    denoise_sigma: float = 1.0
    savgol_window: int = 7
    savgol_poly: int = 3
    skip: int = 25
    subsample: int = 12
    dx: float = 0.1
    dy: float = 0.1
    dt: float = 1.0
    alpha: float = 0.01
    threshold: float = 1e-5
    reference_compat_warp: bool = False
    dtype: str = "float64"
    write_artifacts: bool = True


def dis_register_sequence(U: jnp.ndarray, *, warp_sign: float = 1.0) -> jnp.ndarray:
    """Sequential warp-to-previous DIS registration with 11x11/sigma-2 flow
    smoothing (pde_discovery_improved_registration.py:107-145).

    Host-chained jitted per-frame programs (not lax.scan) — TPU lowers the
    patch-gather-heavy DIS program far slower inside scan (see
    farneback_register_sequence). Frame selection is a dynamic index inside
    the module-level jitted step; warp_sign enters as a runtime scalar (a
    per-call jit closure retraced on every pipeline run)."""
    from pdx.register.farneback import stack_frames, _first_frame

    sign = jnp.asarray(warp_sign, U.dtype)
    ref = _first_frame(U)
    out = [ref]
    for i in range(1, U.shape[0]):
        ref = _dis_step(U, ref, i, sign)
        out.append(ref)
    return stack_frames(*out)


@jax.jit
def _dis_step(U, ref, i, sign):
    from pdx.register.farneback import _blur

    mov = jax.lax.dynamic_index_in_dim(U, i, 0, keepdims=False)
    fx, fy = dis_flow(ref, mov)
    fs = _blur(jnp.stack([fx, fy]), 11, 2.0, True)
    return warp_flow(mov, sign * fs[0], sign * fs[1], border="reflect")


def run(cfg: ImprovedRegistrationConfig, U_raw: np.ndarray | None = None) -> dict[str, Any]:
    from pdx.utils.precision import resolve_dtype

    dtype = resolve_dtype(cfg.dtype)
    if U_raw is None:
        U_raw = load_images(cfg.data_dir, max_images=cfg.max_images)
    U = jnp.asarray(U_raw, dtype=dtype)
    U = gaussian_filter_reflect(U, cfg.denoise_sigma)
    U = (U - U.min()) / (U.max() - U.min())

    sign = -1.0 if cfg.reference_compat_warp else 1.0
    U_fb = farneback_register_sequence(U, warp_sign=sign)
    U_dis = dis_register_sequence(U, warp_sign=sign)

    m_fb = {k: float(v) for k, v in registration_improvement(U, U_fb).items()}
    m_dis = {k: float(v) for k, v in registration_improvement(U, U_dis).items()}

    if m_dis["improvement_pct"] > m_fb["improvement_pct"]:
        U_reg, method = U_dis, "DIS"
    else:
        U_reg, method = U_fb, "Farneback"

    U_smooth = savgol_time(U_reg, cfg.savgol_window, cfg.savgol_poly)
    s, sub = cfg.skip, cfg.subsample
    U_crop = U_smooth[:, s:-s:sub, s:-s:sub]

    dx, dy, dt = cfg.dx, cfg.dy, cfg.dt
    u_x = (U_crop[:, :, 2:] - U_crop[:, :, :-2]) / (2 * dx)
    u_y = (U_crop[:, 2:, :] - U_crop[:, :-2, :]) / (2 * dy)
    u_xx = (U_crop[:, :, 2:] - 2 * U_crop[:, :, 1:-1] + U_crop[:, :, :-2]) / dx**2
    u_yy = (U_crop[:, 2:, :] - 2 * U_crop[:, 1:-1, :] + U_crop[:, :-2, :]) / dy**2
    u_t = (U_crop[2:] - U_crop[:-2]) / (2 * dt)
    mt = min(a.shape[0] for a in (u_x, u_y, u_xx, u_yy, u_t))
    mh = min(a.shape[1] for a in (u_x, u_y, u_xx, u_yy, u_t))
    mw = min(a.shape[2] for a in (u_x, u_y, u_xx, u_yy, u_t))
    u = U_crop[:mt, :mh, :mw]
    u_x, u_y = u_x[:mt, :mh, :mw], u_y[:mt, :mh, :mw]
    u_xx, u_yy = u_xx[:mt, :mh, :mw], u_yy[:mt, :mh, :mw]
    u_t = u_t[:mt, :mh, :mw]
    lap = u_xx + u_yy

    terms = [
        jnp.ones_like(u), u, u_x, u_y, u_xx, u_yy, lap,
        u**2, u * u_x, u * u_y, u**3, u_x**2, u_y**2,
    ]
    X = jnp.stack([t.reshape(-1) for t in terms], axis=1)
    y = u_t.reshape(-1)

    if jnp.dtype(X.dtype).itemsize < 8:
        # f32 backend: the 13-term library (1, u, ..., u^3, u_x^2, ...) is too
        # ill-conditioned for Gram normal equations (cond^2 amplification);
        # solve via QR on the standardized design matrix instead
        from pdx.solve.stridge import stridge_qr

        coeffs = stridge_qr(X, y, alpha=cfg.alpha, threshold=cfg.threshold, max_iter=20)
    else:
        coeffs = stridge_from_stats(
            gram_stats(X, y), alpha=cfg.alpha, threshold=cfg.threshold, max_iter=20
        ).coeffs
    y_pred = X @ coeffs
    r2 = float(r2_score(y, y_pred))

    eq_parts = []
    for c, n in zip(np.asarray(coeffs), TERM_NAMES):
        if abs(c) > 1e-5:
            sign_str = "+" if c > 0 and eq_parts else ""
            eq_parts.append(f"{sign_str}{c:.6f}·{n}")
    equation = "u_t = " + " ".join(eq_parts) if eq_parts else "u_t = 0"

    out = {
        "config": dataclasses.asdict(cfg),
        "farneback_metrics": m_fb,
        "dis_metrics": m_dis,
        "selected_method": method,
        "term_names": TERM_NAMES,
        "coeffs": np.asarray(coeffs),
        "r2": r2,
        "equation": equation,
        "working_shape": (mt, mh, mw),
    }
    if cfg.write_artifacts:
        out_dir = Path(cfg.output_dir)
        write_json(
            out_dir / "registration_study.json",
            {k: v for k, v in out.items() if k != "config"},
        )
        # SLIDE1-4 (pde_discovery_improved_registration.py:254,347,532,592)
        # guarded like the reference's qualitative-figure blocks: a rendering
        # failure must not sink the discovery results
        try:
            _render_slides(cfg, out_dir, U, U_fb, U_dis, m_fb, m_dis, method,
                           U_reg, u_t, lap, u_x, u_y, coeffs, y, y_pred, r2,
                           (mt, mh, mw))
        except Exception as e:  # pragma: no cover - parity with reference guard
            print(f"   (skipped slide rendering: {e})")
    return out


def _render_slides(cfg, out_dir, U, U_fb, U_dis, m_fb, m_dis, method, U_reg,
                   u_t, lap, u_x, u_y, coeffs, y, y_pred, r2, working_shape):
    from pdx.report.pipeline_figures import (
        slide1_registration_quality,
        slide2_flow_fields,
        slide3_pde_results,
        slide4_spatiotemporal,
    )
    from pdx.register.farneback import _blur, farneback_flow

    Un, Ufb, Udis = np.asarray(U), np.asarray(U_fb), np.asarray(U_dis)
    slide1_registration_quality(out_dir, Un, Ufb, Udis, m_fb, m_dis)

    # one flow pair per method at the rendered frame (the slide shows the
    # interframe flow field the registration acted on)
    fi = min(15, U.shape[0] - 2)
    fb = farneback_flow(U[fi], U[fi + 1])
    fb = _blur(jnp.stack(fb), 11, 2.0, True)
    dz = dis_flow(U[fi], U[fi + 1])
    dz = _blur(jnp.stack(dz), 11, 2.0, True)
    slide2_flow_fields(out_dir, Un, np.asarray(fb), np.asarray(dz), frame_idx=fi)

    sel = m_dis if method == "DIS" else m_fb
    slide3_pde_results(
        out_dir, np.asarray(coeffs), TERM_NAMES, np.asarray(y), np.asarray(y_pred),
        r2, method, sel["improvement_pct"], working_shape,
    )
    slide4_spatiotemporal(
        out_dir, np.asarray(U_reg), np.asarray(u_t), np.asarray(lap),
        np.asarray(u_x), np.asarray(u_y),
    )


def cmd_improved_registration(argv: list[str]) -> int:
    import argparse

    parser = argparse.ArgumentParser(prog="pdx improved-registration")
    parser.add_argument("--data-dir", default="data/Real-Images")
    parser.add_argument("--output-dir", default="outputs/latest/registration")
    parser.add_argument("--max-images", type=int, default=51)
    parser.add_argument("--skip", type=int, default=25)
    parser.add_argument("--subsample", type=int, default=12)
    args = parser.parse_args(argv)
    out = run(
        ImprovedRegistrationConfig(
            data_dir=args.data_dir, output_dir=args.output_dir,
            max_images=args.max_images, skip=args.skip, subsample=args.subsample,
        )
    )
    print(f"Farneback: {out['farneback_metrics']['improvement_pct']:.1f}% improvement")
    print(f"DIS:       {out['dis_metrics']['improvement_pct']:.1f}% improvement")
    print(f"Selected:  {out['selected_method']}")
    print(f"R2 = {out['r2']:.6f}")
    print(out["equation"])
    return 0
