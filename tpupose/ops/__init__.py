import os

import jax

from tpupose.ops import image  # noqa: F401


def use_pallas() -> bool:
    """Whether to run the fused Pallas kernels (TPU) or the jnp fallbacks.

    Pallas TPU kernels don't lower on the CPU backend (tests run them in
    interpreter mode explicitly); TPUPOSE_DISABLE_PALLAS=1 forces the jnp
    path everywhere for debugging.
    """
    if os.environ.get("TPUPOSE_DISABLE_PALLAS"):
        return False
    return jax.default_backend() != "cpu"
