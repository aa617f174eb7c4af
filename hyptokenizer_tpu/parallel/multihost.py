"""Multi-host initialisation and mesh construction.

Net-new vs the reference (it has no distributed layer; SURVEY §2.6). On a
multi-host pod slice each host calls :func:`initialize_multihost` once before
any jax computation; the vocabulary mesh axis then spans every chip (ICI
within hosts, DCN across), and the same SPMD-sharded merge loop runs unchanged
— XLA places the argmin/all-gather collectives on ICI where the axis layout
allows.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

logger = logging.getLogger(__name__)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` with TPU auto-detection.

    On Cloud TPU pods all arguments are auto-detected; explicit values support
    CPU/GPU clusters and tests.
    """
    # NOTE: jax.process_count() would itself initialise the XLA backend,
    # after which jax.distributed.initialize() refuses to run — use the
    # dedicated predicate.
    if jax.distributed.is_initialized():
        return
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info("jax.distributed initialised: process %d/%d, %d devices",
                    jax.process_index(), jax.process_count(),
                    jax.device_count())
    except Exception as e:
        if explicit:
            # A requested coordinator that cannot be reached is a hard error —
            # silently running single-host would corrupt a multi-host job.
            raise
        logger.info("multi-host init skipped (%s); running single-host", e)


def global_mesh():
    """1-D vocabulary-axis mesh over every global device."""
    from hyptokenizer_tpu.parallel.mesh import make_mesh
    return make_mesh(jax.devices())
