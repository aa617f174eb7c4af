"""Device-mesh parallelism (net-new capability — the reference has none).

SURVEY §2.6: the reference is single-process single-device; the TPU-native
framework scales via ``jax.sharding`` SPMD over a mesh. The merge loop's heavy
ops (the (V, d+1) x (d+1,) candidate matvecs and the periodic full pairwise
pass) shard along the vocabulary axis; XLA inserts the argmin/all-gather
collectives.
"""

from hyptokenizer_tpu.parallel.mesh import (  # noqa: F401
    VOCAB_AXIS,
    make_mesh,
    shard_state,
    state_shardings,
)
from hyptokenizer_tpu.parallel.sharded import run_merges_sharded  # noqa: F401
