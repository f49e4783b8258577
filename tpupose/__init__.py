"""tpupose — a TPU-native multi-person 2D pose-estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
repo GuruMulay/Adapting-RGB-Pose-Estimation-to-New-Domains (OpenPose-style
VGG19 + 6-stage heatmap/PAF CNN with multi-scale inference, greedy PAF
decode, on-device ground-truth generation and domain-adaptation
fine-tuning). See SURVEY.md for the behavioural contract and BASELINE.md
for the performance targets.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Some environments ship a sitecustomize that registers an accelerator
    # plugin and force-overrides jax_platforms at interpreter start,
    # silently ignoring the JAX_PLATFORMS env var. Re-assert the user's
    # explicit choice (works as long as no backend has been initialised).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - config name drift
        pass

if _os.environ.get("TPUPOSE_COMPILE_CACHE"):
    from tpupose.utils.compile_cache import enable_from_env as _ecc

    _ecc()

from tpupose import config, topology  # noqa: F401
