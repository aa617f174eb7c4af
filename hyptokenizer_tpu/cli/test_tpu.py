"""Device smoke test: backend, matmul timing, Minkowski-dot check.

TPU-native parity with ``scripts/test_mps.py`` (which smoke-tests Apple MPS).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kernel-check", action="store_true",
                   help="also run the XLA-vs-Pallas merge-sequence "
                        "equivalence for both fused kernels on this device")
    args = p.parse_args(argv)
    print(f"backend: {jax.default_backend()}")
    print(f"devices: {jax.devices()}")

    x = jnp.ones((2048, 2048), jnp.float32)
    (x @ x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        y = x @ x
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    flops = 2 * 2048 ** 3
    print(f"2048^3 matmul: {dt * 1e3:.2f} ms ({flops / dt / 1e12:.1f} TFLOP/s)")

    from hyptokenizer_tpu.ops import lorentz as L
    pts = L.random_points(jax.random.PRNGKey(0), 8, 10, sigma=0.5)
    md = np.asarray(L.minkowski_dot(pts, pts))
    ok = np.allclose(md, 1.0, atol=1e-5)
    print(f"minkowski <x,x>=1 on manifold: {'OK' if ok else 'FAIL'} "
          f"(max err {np.abs(md - 1).max():.2e})")

    if args.kernel_check:
        from hyptokenizer_tpu.evals.selfcheck import kernel_selfcheck
        import json
        print(json.dumps(kernel_selfcheck()))


if __name__ == "__main__":
    main()
