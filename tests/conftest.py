"""Test configuration: force an 8-device virtual CPU backend.

Multi-device logic (DP sharding, psum grad sync, CFG-pair sharding) is
tested on CPU with XLA's host-platform device-count trick, per the build
plan in SURVEY.md §4.
"""

import os

# Force CPU: the session env may point JAX_PLATFORMS at a TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU collectives synchronize the 8 virtual device threads through a
# rendezvous that WARNS at 20 s and then ABORTS THE WHOLE PROCESS at 40 s
# if any participant thread hasn't arrived ("Termination timeout for
# `all gather` ... Exiting to ensure a consistent program state",
# rendezvous.cc F-log -> SIGABRT).  On this 1-core pool VM a participant
# thread is easily starved past 40 s by concurrent cold compiles / cache
# compression / other processes, which is the true root cause of the
# "non-reproducing" flagship-fsdp fatal crash (captured 2026-08-17 in
# /tmp/suite_r3c.log with a FRESH compile cache, ruling out the earlier
# AOT-cache-poisoning theory for this mode).  Raise both timeouts so a
# starved thread waits instead of killing the suite.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = flags
# Keep compilation deterministic & fast for tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The image's sitecustomize (PYTHONPATH=/root/.axon_site) re-forces the
# 'axon' TPU platform over the env var; the config knob wins over both.
jax.config.update("jax_platforms", "cpu")

# The image's default matmul precision is reduced (bf16-class) even on CPU;
# parity tests need true float32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")

# Persist compiled programs across test runs (most suite time is compiles).
#
# The cache directory is keyed by a HOST-CPU fingerprint: XLA:CPU stores
# AOT-compiled executables, and loading one on a machine lacking any
# compile-time target feature logs a cpu_aot_loader feature-mismatch
# error and then fatally aborts in an Eigen worker thread — the round-2
# "non-reproducing" flagship-fsdp crash.  Crucially, the recorded
# features include XLA-internal tuning pseudo-features
# (+prefer-no-scatter / +prefer-no-gather) derived from the CPU *model*
# via LLVM host detection, NOT from the /proc/cpuinfo flags line — two
# pool VMs with byte-identical flags can still mismatch (observed
# 2026-08-17: abort inside a flags-keyed cache dir; the stress-loop
# capture in /tmp/stress_fsdp_FAIL_1.log shows host features lacking
# prefer-no-scatter while every ISA flag matched).  So the fingerprint
# hashes the model identity lines (model name / model / stepping —
# what LLVM's detection keys on) together with the flags line.
import hashlib  # noqa: E402


def _cpu_fingerprint() -> str:
    ident = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":")[0].strip()
                if key in ("vendor_id", "cpu family", "model",
                           "model name", "stepping", "flags"):
                    ident.append(line.strip())
                if line.strip() == "" and ident:
                    break  # first core only — all cores identical
    except OSError:
        import platform

        ident = [platform.processor()]
    return hashlib.sha1("\n".join(ident).encode()).hexdigest()[:12]


_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache",
                          _cpu_fingerprint())
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
