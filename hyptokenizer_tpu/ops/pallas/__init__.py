"""Pallas TPU kernels for the candidate-search hot path."""

from hyptokenizer_tpu.ops.pallas.pairwise import (  # noqa: F401
    pairwise_min_best,
)
