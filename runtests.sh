#!/bin/sh
# Run the test suite on the CPU backend WITHOUT registering the axon TPU
# plugin (an empty PALLAS_AXON_POOL_IPS skips sitecustomize registration, so
# test processes never claim the TPU tunnel out from under a real-TPU run).
#
# The suite runs in SHARDS of a few test files per pytest process: this
# container live-migrates between hosts with different CPU ISA features, and
# XLA:CPU's JIT sporadically SIGSEGVs under accumulated compile load in one
# long-lived process (observed in backend_compile_and_load and in the
# persistent-cache (de)serializers; never reproducible in per-group runs).
# Sharding bounds per-process compile state; a genuine test failure still
# fails this script (set -e).
set -e
cd "$(dirname "$0")"

GROUP_SIZE=6
files=$(ls tests/test_*.py)
group=""
count=0
for f in $files; do
    group="$group $f"
    count=$((count + 1))
    if [ "$count" -ge "$GROUP_SIZE" ]; then
        # shellcheck disable=SC2086
        env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
            python -m pytest $group "$@"
        group=""
        count=0
    fi
done
if [ -n "$group" ]; then
    # shellcheck disable=SC2086
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python -m pytest $group "$@"
fi
