"""Host-side image ingestion (TIFF stacks of real laser-matter frames).

Parity: the four near-copy loaders in the reference —
transport_pde_discovery.py:26-44, patch_based_pde_discovery.py:101-122,
analyze_results.py:201-218, patch_based_sindy.py:62-86. All glob sorted
``*.tif`` (<= max_images), read grayscale (converting BGRA/BGR when needed),
and cast to float. Decode prefers cv2, falls back to PIL, then to raw numpy
(.npy stacks) so the framework runs in cv2-free environments.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from pathlib import Path

import numpy as np

try:  # host-side decode backends, best-effort
    import cv2  # type: ignore
except Exception:  # pragma: no cover
    cv2 = None

try:
    from PIL import Image  # type: ignore
except Exception:  # pragma: no cover
    Image = None


def _read_gray(path: Path) -> np.ndarray | None:
    if cv2 is not None:
        img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if img is None:
            return None
        if img.ndim == 3:
            if img.shape[2] == 4:
                img = cv2.cvtColor(img, cv2.COLOR_BGRA2GRAY)
            else:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        return img
    if Image is not None:
        with Image.open(path) as im:
            return np.asarray(im.convert("L"))
    raise RuntimeError("no image decode backend available (cv2/PIL)")


def _cache_dir() -> Path:
    return Path(
        os.environ.get("PDX_STACK_CACHE_DIR")
        or Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")) / "pdx" / "stacks"
    )


def _cache_key(files: list[Path], mode: str, dtype) -> str:
    """Content key over the exact decode inputs: per-file (name, size,
    mtime_ns) plus decode mode/dtype. Any touched/replaced frame changes
    the key, so a stale cache can never be returned."""
    h = hashlib.sha1()
    h.update(f"{mode}|{np.dtype(dtype).str}".encode())
    for f in files:
        st = f.stat()
        h.update(f"|{f}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()


def _cache_load(key: str) -> np.ndarray | None:
    path = _cache_dir() / f"{key}.npy"
    if not path.exists():
        return None
    try:
        return np.load(path)
    except Exception:  # truncated/corrupt cache entry: fall through to decode
        return None


def _cache_store(key: str, stack: np.ndarray) -> None:
    d = _cache_dir()
    try:
        d.mkdir(parents=True, exist_ok=True)
        # atomic publish: a crash mid-write must never leave a readable
        # half-entry under the final name
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".npy.tmp")
        try:
            with os.fdopen(fd, "wb") as fh:
                np.save(fh, stack)
            os.replace(tmp, d / f"{key}.npy")
        except BaseException:
            os.unlink(tmp)
            raise
    except Exception:  # cache is best-effort; decode result is already in hand
        pass


def load_images(
    folder: str | Path,
    *,
    max_images: int = 51,
    pattern: str = "*.tif",
    mode: str = "unchanged",  # unchanged | grayscale_u8
    dtype=np.float32,
    cache: bool | None = None,
) -> np.ndarray:
    """Load a sorted image stack as (T, H, W) float array.

    ``mode='grayscale_u8'`` matches analyze_results.py:204
    (IMREAD_GRAYSCALE); ``'unchanged'`` matches the other loaders
    (IMREAD_UNCHANGED + gray conversion).

    ``cache``: decoded-stack cache (default on; disable with
    ``PDX_STACK_CACHE=0``). Every pipeline in the suite re-reads the same
    immutable 51-frame stack; on this class of host the per-frame TIFF
    decode dominates (~0.5 s/frame single-core) where one sequential read
    of the decoded array is ~1-2 s. Entries live under
    ``~/.cache/pdx/stacks`` keyed by (file list, sizes, mtimes, mode,
    dtype) — touching any frame invalidates. The reference re-decodes per
    script run (it has no loader layer to hang a cache on); real_bench's
    cold timings still include the decode+cache-write cost.
    """
    folder = Path(folder)
    files = sorted(folder.glob(pattern))[: int(max_images)]
    if not files:
        # allow .npy stack fallback for synthetic testing environments
        npy = sorted(folder.glob("*.npy"))
        if npy:
            U = np.load(npy[0])
            return U[: int(max_images)].astype(dtype)
        raise FileNotFoundError(f"No {pattern} files found in: {folder}")

    if cache is None:
        cache = os.environ.get("PDX_STACK_CACHE", "1") != "0"
    key = _cache_key(files, mode, dtype) if cache else None
    if key is not None:
        hit = _cache_load(key)
        if hit is not None:
            return hit

    def read_one(f: Path) -> np.ndarray | None:
        if mode == "grayscale_u8" and cv2 is not None:
            return cv2.imread(str(f), cv2.IMREAD_GRAYSCALE)
        return _read_gray(f)

    # decode on a thread pool (cv2/PIL release the GIL) and cast-assign each
    # frame straight into one preallocated output block: building a list of
    # per-frame float copies and np.stack-ing them doubles the traffic
    # through this host's slow memory (measured 6 s of a 7 s load on the
    # 51-frame reference-scale stack just in the final stack copy)
    from concurrent.futures import ThreadPoolExecutor

    out: np.ndarray | None = None
    kept = 0
    with ThreadPoolExecutor(max_workers=min(8, len(files))) as pool:
        for img in pool.map(read_one, files):
            if img is None:
                continue
            if out is None:
                out = np.empty((len(files),) + img.shape, dtype=dtype)
            out[kept] = img
            kept += 1
    if out is None or kept == 0:
        raise RuntimeError("no readable images found in the data directory")
    out = out[:kept]
    if key is not None:
        _cache_store(key, out)
    return out


def list_image_resolutions(folder: str | Path, pattern: str = "*.tif") -> dict[tuple[int, int], int]:
    """Size histogram of an image folder (scripts/list_image_resolutions.py)."""
    folder = Path(folder)
    hist: dict[tuple[int, int], int] = {}
    for f in sorted(folder.glob(pattern)):
        img = _read_gray(f)
        if img is None:
            continue
        key = (int(img.shape[0]), int(img.shape[1]))
        hist[key] = hist.get(key, 0) + 1
    return hist
