"""Persistent XLA compilation cache for the slow remote-compile path.

The axon TPU platform compiles through a remote HTTP hop; big scans take
minutes PER PROCESS, so every CLI invocation, bench run, and eval chunk
used to pay full price (round-2 "Known quirks": first eval ~minutes).
JAX's persistent cache works through this path (measured round 3: a 233 s
compile replayed in 0.24 s from a second process), so every entry point
enables it here. The reference has no analog - TF1 sessions rebuild their
graph per process and CARLA itself dwarfs compile time; for this framework
compile latency IS the startup cost, making the cache part of the product.

Env overrides: CARLA_PPO_CACHE_DIR picks the location (default
<repo>/.jax_cache); CARLA_PPO_CACHE_DIR=0 disables.

Known-benign noise: reloading a CPU AOT entry logs a loud
"Target machine feature +prefer-no-scatter is not supported on the host
machine" warning EVEN FOR SAME-HOST ENTRIES - XLA:CPU compiles with
model-derived tuning preferences (prefer-no-scatter/gather) that its
loader's host-feature check doesn't recognize as satisfiable (verified by
compiling and reloading in back-to-back processes on one machine: the
second process warns, round 3 late session). Real foreign-ISA loads list genuinely
missing ISA features (avx512*, amx*); those are what the fingerprint
partitioning prevents.
"""

from __future__ import annotations

import os

_enabled = False


def _cpu_fingerprint() -> str:
    """Short stable hash of the host's CPU model + feature flags (for
    partitioning CPU AOT cache entries by the machine that can actually run
    them).

    The model name matters beyond the flags: XLA derives tuning target
    features from the CPU FAMILY (e.g. +prefer-no-scatter on some Intel
    generations) that never appear in /proc/cpuinfo, so two hosts with
    identical flag sets can still produce mutually-foreign AOT blobs
    (observed round 3: loud feature-mismatch warnings from a flags-keyed
    partition after a VM change)."""
    import hashlib

    try:
        feats = ""
        model = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not feats and line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                elif not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                if feats and model:
                    break
        if feats or model:
            return hashlib.sha256(f"{model}|{feats}".encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform as _platform

    return _platform.machine() or "unknown"


def enable(cache_dir: str | None = None) -> str | None:
    """Idempotently switch on the persistent compilation cache.

    Must run before the first jit compilation to benefit it; safe any time.
    Returns the cache dir in effect (None if disabled).
    """
    global _enabled
    import jax

    env = os.environ.get("CARLA_PPO_CACHE_DIR")
    if env == "0":
        return None
    if cache_dir is None:
        # Partition by requested platform AND a host-CPU-feature fingerprint.
        # CPU AOT executables embed the compiling machine's CPU features, and
        # the repo (with its cache) moves between VM types across sessions -
        # loading a prior host's blobs risks SIGILL (the loader only warns).
        # The fingerprint must cover EVERY partition, not just ones whose
        # JAX_PLATFORMS mentions cpu: the env var is read at import, but
        # tests and dryrun_multichip flip the backend to cpu afterwards via
        # jax.config.update, so any partition can accumulate CPU executables
        # (observed: foreign-feature AOT warnings from the 'axon' dir after
        # a VM change). Cost: a host change orphans the TPU entries too -
        # one slow recompile per VM type, traded for never executing
        # foreign-ISA code.
        platform = (
            os.environ.get("JAX_PLATFORMS", "axon").replace(",", "-")
            or "default"
        )
        platform = f"{platform}-{_cpu_fingerprint()}"
        cache_dir = env or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
            platform,
        )
    if _enabled:
        return jax.config.jax_compilation_cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the remote hop makes even small compiles slow.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return cache_dir
