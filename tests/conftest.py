"""Test harness: force an 8-device virtual CPU mesh before jax imports.

This is the standard JAX fake-backend trick (SURVEY.md section 4d): all
sharding/mesh code paths are exercised on 8 virtual CPU devices, so the
suite runs anywhere and multi-chip logic is tested without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-overrides jax_platforms at interpreter
# start; importing tpupose re-asserts the env var (see tpupose/__init__).
import jax  # noqa: E402

import tpupose  # noqa: E402, F401

assert jax.default_backend() == "cpu", jax.default_backend()

# NaN sanitiser (SURVEY.md 5.2): TPUPOSE_DEBUG_NANS=1 makes every test
# fail loudly at the op that produced a NaN.
if os.environ.get("TPUPOSE_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)

# Persistent compilation cache: the suite is compile-bound; repeated runs
# hit the cache instead of re-lowering the 52M-param model.
#
# READS stay on; WRITES are off by default: serializing one of the big
# multi-device decode executables for the cache write segfaults/aborts
# XLA's CPU backend once a suite process has accumulated enough prior
# compiles (reproduced 3x at the same test on an idle machine; the same
# compile+write succeeds in a fresh process — upstream serialization
# bug at scale, TPU unaffected). TPUPOSE_CACHE_WRITE=1 re-enables
# writes to (re)populate the cache via per-file runs, where the bug
# does not trigger.
# The cache dir carries a host fingerprint: XLA:CPU AOT executables are
# compiled for the exact machine's feature set, and loading blobs cached
# on a different host fails the feature check on every read (pure
# overhead + error spam). A new machine starts a fresh cache instead.
def _host_tag() -> str:
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            # x86 exposes "flags", aarch64 "Features" — take whichever
            isa = next(
                (ln for ln in f
                 if ln.startswith(("flags", "Features"))), ""
            )
    except OSError:
        isa = ""
    raw = f"{platform.machine()}:{isa}"
    return hashlib.sha1(raw.encode()).hexdigest()[:8]


_CACHE_DIR = f"/tmp/tpupose_jax_cache_{_host_tag()}"
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
# Children (subprocess-quarantined checks, multihost/preemption workers)
# don't inherit in-process jax.config — export env vars so THEY get the
# cache too. Fresh short-lived processes may safely WRITE (the write
# crash needs an aged process), so they organically populate the cache.
os.environ["JAX_COMPILATION_CACHE_DIR"] = _CACHE_DIR
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    1.0 if os.environ.get("TPUPOSE_CACHE_WRITE") else 1e9,
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
