#!/bin/sh
# Run the test suite on the CPU backend WITHOUT registering the axon TPU
# plugin (an empty PALLAS_AXON_POOL_IPS skips sitecustomize registration, so
# test processes never claim the TPU tunnel out from under a real-TPU run).
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ "$@"
