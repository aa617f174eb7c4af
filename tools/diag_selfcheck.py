"""Diagnose on-chip XLA-vs-Pallas merge-sequence divergences."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from hyptokenizer_tpu.ops import lorentz as L
from hyptokenizer_tpu.tokenizer import MergeConfig, init_state, run_merges

print("device:", jax.devices()[0].platform, flush=True)

key = jax.random.PRNGKey(7)
emb0 = L.random_points(key, 512, 100, sigma=0.5)
lengths0 = jnp.ones((512,), jnp.int32)
config = MergeConfig(max_vocab_size=1024, search_block=256)
seqs = {}
dists = {}
for use_pallas in (False, True):
    cfg = config.replace(use_pallas=use_pallas)
    st = init_state(emb0, lengths0, curvature=1.0, threshold=10.0,
                    config=cfg)
    st = run_merges(st, cfg, 250)
    n = int(st.num_merges)
    seqs[use_pallas] = np.asarray(st.merges[:n])
    print("pallas" if use_pallas else "xla", "merges:", n, flush=True)

a, b = seqs[False], seqs[True]
n = min(len(a), len(b))
div = None
for k in range(n):
    if not np.array_equal(a[k], b[k]):
        div = k
        break
print("first divergence at:", div, "of", len(a), len(b))
if div is not None:
    lo = max(0, div - 2)
    print("xla   :", a[lo:div + 3].tolist())
    print("pallas:", b[lo:div + 3].tolist())
