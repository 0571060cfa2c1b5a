"""Host-side image ingestion (TIFF stacks of real laser-matter frames).

Parity: the four near-copy loaders in the reference —
transport_pde_discovery.py:26-44, patch_based_pde_discovery.py:101-122,
analyze_results.py:201-218, patch_based_sindy.py:62-86. All glob sorted
``*.tif`` (<= max_images), read grayscale (converting BGRA/BGR when needed),
and cast to float. Decode prefers cv2, falls back to PIL, then to raw numpy
(.npy stacks) so the framework runs in cv2-free environments.
"""

from __future__ import annotations

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


def load_images(
    folder: str | Path,
    *,
    max_images: int = 51,
    pattern: str = "*.tif",
    mode: str = "unchanged",  # unchanged | grayscale_u8
    dtype=np.float32,
) -> np.ndarray:
    """Load a sorted image stack as (T, H, W) float array.

    ``mode='grayscale_u8'`` matches analyze_results.py:204
    (IMREAD_GRAYSCALE); ``'unchanged'`` matches the other loaders
    (IMREAD_UNCHANGED + gray conversion).
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
    return out[:kept]


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
