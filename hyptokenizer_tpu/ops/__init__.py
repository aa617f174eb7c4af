"""Hyperbolic geometry ops (L1 of the framework).

Pure, stateless, jit-compatible jnp functions. Numerical-stability constants
follow the reference exactly (embedding/lorentz_model.py, embedding/poincare_ball.py)
because they gate token-id conformance.
"""

from hyptokenizer_tpu.ops import lorentz, poincare  # noqa: F401
