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


# in-process decoded-stack cache: the warm pass of every pipeline (and any
# notebook/server process that re-runs the suite on the same immutable
# stack) re-pays a multi-second host I/O read of the disk cache entry on
# this class of host (~12 MB/s effective: 23 s for the 267 MB f32
# reference-scale stack, measured 2026-08-18). Entries are published
# READ-ONLY — a caller mutating the returned array would corrupt every
# later hit, so numpy is told to fail loudly instead. Keyed identically to
# the disk cache (content key), capped to a handful of stacks (128 GB host).
_MEM_CACHE: dict[str, np.ndarray] = {}
_MEM_CACHE_CAP = 4


def clear_stack_memcache() -> None:
    """Drop the in-process decoded-stack cache (benchmark harnesses call
    this before a 'cold' pass so cold timings include the real load)."""
    _MEM_CACHE.clear()


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

    ``cache``: two-level decoded-stack cache (default on; disable with
    ``PDX_STACK_CACHE=0``, memory level alone with ``PDX_STACK_MEMCACHE=0``).
    Every pipeline in the suite re-reads the same immutable 51-frame stack;
    the per-frame TIFF decode dominates (~0.5 s/frame single-core). Disk
    entries live under ``~/.cache/pdx/stacks`` keyed by (file list, sizes,
    mtimes, mode, dtype) — touching any frame invalidates — and are stored
    in the compact SOURCE dtype (a u16 stack is half the disk traffic of
    the f32 it decodes to; this host reads ~12 MB/s). Within one process,
    hits come straight from ``_MEM_CACHE`` (read-only aliases, zero I/O) —
    the level a warm pipeline re-run or a notebook session actually feels.
    The reference re-decodes per script run (it has no loader layer to hang
    a cache on); benchmark harnesses call :func:`clear_stack_memcache` and
    point ``PDX_STACK_CACHE_DIR`` at a fresh dir so their cold timings
    still include the full decode.
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
    use_mem = key is not None and os.environ.get("PDX_STACK_MEMCACHE", "1") != "0"
    if use_mem and key in _MEM_CACHE:
        return _MEM_CACHE[key]
    if key is not None:
        hit = _cache_load(key)
        if hit is not None:
            # disk entries are stored in the compact SOURCE dtype (u8/u16
            # TIFs: half/quarter the disk traffic of the f32 stack on this
            # ~12 MB/s disk); cast to the requested dtype here
            if hit.dtype != np.dtype(dtype):
                hit = hit.astype(dtype)
            return _mem_publish(key, hit) if use_mem else hit

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
                # decode into the SOURCE dtype (u16 TIFs: half the memory
                # traffic of an f32 block on this slow-memory host, and the
                # disk cache entry below stays compact)
                out = np.empty((len(files),) + img.shape, dtype=img.dtype)
            out[kept] = img
            kept += 1
    if out is None or kept == 0:
        raise RuntimeError("no readable images found in the data directory")
    out = out[:kept]
    if key is not None:
        _cache_store(key, out)  # compact source-dtype entry
    if out.dtype != np.dtype(dtype):
        out = out.astype(dtype)
    return _mem_publish(key, out) if use_mem else out


def _mem_publish(key: str, stack: np.ndarray) -> np.ndarray:
    """Insert into the in-process cache (FIFO-capped) and return the entry
    read-only: every later hit aliases this exact array."""
    stack.setflags(write=False)
    while len(_MEM_CACHE) >= _MEM_CACHE_CAP:
        _MEM_CACHE.pop(next(iter(_MEM_CACHE)))
    _MEM_CACHE[key] = stack
    return stack


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
