"""HypTokenizer-TPU: a TPU-native hyperbolic tokenization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``sangaprabhav/HypTokenizer`` project (PyTorch, single-device):

- ``ops``        — Lorentz / Poincaré hyperbolic geometry kernels (jit-compiled jnp,
                   Pallas kernels for the pairwise-distance hot path).
- ``tokenizer``  — the merge-training state machine (incremental candidate tracking,
                   scoring variants, conformant encode/decode, artifact I/O).
- ``models``     — hyperbolic contrastive losses + multimodal two-tower model (flax).
- ``parallel``   — device-mesh sharding of the merge loop and corpus statistics.
- ``utils``      — data pipeline, configs, metrics, checkpointing.

Design notes: where the reference recomputes an O(V^2 d) distance matrix per merge
step (tokenizer/hyperbolic_merge.py:192-291), this framework maintains per-row
best-candidate arrays updated with O(V d) work per merge, and uses a tiled Pallas
kernel for periodic full passes — both exact, not approximate (no FAISS analogue
needed).
"""

__version__ = "0.1.0"

from hyptokenizer_tpu.ops import lorentz, poincare  # noqa: F401
