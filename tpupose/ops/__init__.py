import os

import jax

from tpupose.ops import image  # noqa: F401


def use_pallas() -> bool:
    """Whether to run the fused Pallas PEAKS kernel (TPU) or the jnp
    fallback. The kernel beats XLA's blur+NMS 5.6x on the chip (4.1 vs
    22.7 ms/batch-8, round 2) and is the TPU default.

    The kernels are Mosaic (TPU) kernels: they don't lower on CPU (tests
    run them in interpreter mode explicitly) or on GPU backends, so the
    gate requires an actual TPU backend rather than merely "not cpu".
    TPUPOSE_DISABLE_PALLAS=1 forces the jnp path everywhere for
    debugging.
    """
    if os.environ.get("TPUPOSE_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def use_pallas_block1() -> bool:
    """Fused block-1 kernel (conv1_1+relu+conv1_2+relu+pool1 in one HBM
    pass, ops/pallas_block1.py) on the inference path. TPU default
    pending the round-5 measurement (experiments/block1_pallas_r5.py);
    TPUPOSE_PALLAS_BLOCK1=0/1 overrides."""
    env = os.environ.get("TPUPOSE_PALLAS_BLOCK1")
    if env is not None:
        return env not in ("", "0") and use_pallas()
    return use_pallas()


def use_pallas_sample() -> bool:
    """Fused scale-space point readout (ops/pallas_sample.py) on the
    dense-crowd decode tiers (K^2*mid_num beyond the fuse-all budget).
    The chunked HBM path it replaces measured 289 ms/batch-8 at K=96
    (round-3 dense-decode table); TPUPOSE_PALLAS_SAMPLE=0/1 overrides.
    Read at trace time — baked into the decode's jit caches."""
    env = os.environ.get("TPUPOSE_PALLAS_SAMPLE")
    if env is not None:
        return env not in ("", "0") and use_pallas()
    return use_pallas()


def use_pallas_gt() -> bool:
    """The GT-rasterise Pallas kernel is DEMOTED from the default path:
    measured 3.08 ms vs 2.56 ms for the XLA fallback (batch 10, mask
    fused, round 2) — below the >=1.2x bar a default kernel must clear.
    Set TPUPOSE_PALLAS_GT=1 to opt in; the kernel stays parity-tested."""
    return bool(os.environ.get("TPUPOSE_PALLAS_GT")) and use_pallas()


def use_pallas_assoc() -> bool:
    """Whether the fused greedy+assembly association kernel
    (ops/pallas_assoc.py) replaces the two lax.scan stages on TPU. The
    scans cost ~30-90 us/iteration on the chip (10.8 ms of the batch-8
    decode, round 2) while the kernel runs both loops in one VMEM
    residency. TPUPOSE_DISABLE_PALLAS_ASSOC=1 forces the lax path."""
    if os.environ.get("TPUPOSE_DISABLE_PALLAS_ASSOC"):
        return False
    return use_pallas()
