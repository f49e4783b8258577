"""Pure-NumPy/SciPy twin of the reference pipeline.

These implementations follow the algorithm specification in SURVEY.md
(sections 2.1 and 3) of the reference repo
GuruMulay/Adapting-RGB-Pose-Estimation-to-New-Domains. They serve two
purposes:

  1. Golden oracle: every jnp / Pallas implementation in the framework is
     tested for parity against this twin.
  2. CPU-latency denominator for the ">10x per-image CPU latency" target
     (BASELINE.json north star).

They are NOT on any production path.
"""

from tpupose.reference_impl import decode_np, gt_np  # noqa: F401
