"""tpupose — a TPU-native multi-person 2D pose-estimation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
repo GuruMulay/Adapting-RGB-Pose-Estimation-to-New-Domains (OpenPose-style
VGG19 + 6-stage heatmap/PAF CNN with multi-scale inference, greedy PAF
decode, on-device ground-truth generation and domain-adaptation
fine-tuning). See SURVEY.md for the behavioural contract and BASELINE.md
for the performance targets.
"""

__version__ = "0.1.0"

from tpupose import config, topology  # noqa: F401
