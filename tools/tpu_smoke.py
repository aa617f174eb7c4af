"""Fast on-chip validation of the fused kernels (run FIRST on a fresh chip).

Runs the shared kernel self-check (ops parity for the distance-only loop and
the fused enhanced segment kernel vs their XLA paths) plus a tiny throughput
probe. Exits nonzero on any FAIL. Usage: python tools/tpu_smoke.py
"""

import json
import sys
import time


def main() -> int:
    import jax

    t0 = time.time()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({time.time() - t0:.1f}s to attach)",
          flush=True)

    from hyptokenizer_tpu.evals.selfcheck import kernel_selfcheck
    t0 = time.time()
    out = kernel_selfcheck()
    out["selfcheck_seconds"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)
    return 1 if "FAIL" in out.values() else 0


if __name__ == "__main__":
    sys.exit(main())
