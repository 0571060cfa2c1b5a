"""pdx.library — candidate-term dictionaries and dataset builders (L3)."""

from pdx.library.dictionaries import (
    build_dictionary_true,
    build_dictionary_rich,
    KS_GROUND_TRUTH,
)
from pdx.library.pointwise import build_pointwise_dataset
from pdx.library.blockwise import build_blockwise_dataset

__all__ = [
    "build_dictionary_true",
    "build_dictionary_rich",
    "KS_GROUND_TRUTH",
    "build_pointwise_dataset",
    "build_blockwise_dataset",
]
