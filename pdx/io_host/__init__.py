"""pdx.io_host — host-side IO: image ingest and result artifacts (L1/L8)."""

from pdx.io_host.images import load_images, list_image_resolutions
from pdx.io_host.artifacts import write_json, write_best_model, write_models_comparison

__all__ = [
    "load_images",
    "list_image_resolutions",
    "write_json",
    "write_best_model",
    "write_models_comparison",
]
