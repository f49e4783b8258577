"""Frozen configuration dataclasses.

Mirrors the reference's two config tiers (SURVEY.md section 5.6):
  * the INI ``config`` + ``config_reader.py`` inference parameters
    (scale_search, thre1/thre2, boxsize/stride/padValue, mid_num), and
  * ``py_rmpe_config.py``'s RmpeGlobalConfig / TransformationParams
    (input geometry, augmentation ranges, GT sigma / paf_thre).

Field names intentionally keep the reference's vocabulary (thre1, sigma,
paf_thre, target_dist, ...) so the numeric contract is auditable, while
adding TPU-specific knobs (static capacity limits for jit, compute dtype).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Geometry of the network (reference: config [model] section)."""

    boxsize: int = 368          # training / canonical inference input size
    stride: int = 8             # output stride -> 46x46 maps at 368 input
    pad_value: int = 128        # gray padding for right/down pad
    input_channels: int = 3
    num_stages: int = 6         # CPM/PAF refinement stages
    # "bgr" matches the reference's cv2-fed weights; use "rgb" for new models.
    channel_order: str = "bgr"
    # Compute dtype for conv stack; params stay float32.
    compute_dtype: str = "bfloat16"

    @property
    def label_size(self) -> int:
        return self.boxsize // self.stride   # 46


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """Decode hyperparameters (reference: config [param] section)."""

    scale_search: tuple[float, ...] = (0.5, 1.0, 1.5, 2.0)
    thre1: float = 0.1          # heatmap peak threshold
    thre2: float = 0.05         # PAF midpoint threshold
    mid_num: int = 10           # samples along each candidate limb segment
    peak_sigma: float = 3.0     # gaussian smoothing before NMS
    connect_min_ratio: float = 0.8   # fraction of midpoints above thre2
    min_subset_cnt: int = 4     # drop skeletons with fewer parts
    min_subset_score: float = 0.4    # drop skeletons with score/cnt below

    # Static capacities for jit-compiled decode (reference is dynamic NumPy;
    # SURVEY.md section 7 "hard parts"). COCO maxima comfortably fit these.
    max_peaks: int = 96         # per part channel
    max_people: int = 96        # subset rows returned by the decode
    # Working capacity of the assembly scan: concurrent PARTIAL people
    # (most are culled by min_subset_cnt at the end) can far exceed the
    # final count — dense fields need ~2x the seeding connections. When
    # the scan table is full, further seeds are dropped (the reference's
    # dynamic list has no cap; fuzz parity holds within this capacity).
    scan_people_capacity: int = 256
    # Adaptive fast tiers: when EVERY part channel has at most `t` peaks
    # for some tier capacity `t` (typical scenes hold <= 8; COCO crowds
    # top out around ~20), PAF pair scoring + assembly run at the
    # smallest adequate capacity — bitwise identical results, since the
    # K x K pair grid costs O(K^2) and peaks fill the leading slots.
    # Runtime lax.conds pick the tier; () disables (always max_peaks).
    # Ladder measured round 3 (experiments/dense_decode_r3.py, on-chip
    # decode ms/batch-8): <=8 peaks 10 ms, <=16 17.8, <=32 42.6,
    # <=64 133, K=96 fallback 287 — the 16 tier is 2.4x for mid scenes
    # and the 64 tier cushions the crowd cliff 2.15x.
    pair_tiers: tuple[int, ...] = (8, 16, 32, 64)
    # Adaptive peak-compaction capacity: the scan-order slot compaction
    # streams an (H*W, K) one-hot contraction per part channel, so K=96
    # prices a worst case real scenes never reach. When every channel's
    # peak count fits a tier, compaction runs at that capacity and the
    # tables are zero-padded to max_peaks — bitwise identical.
    # () disables (always max_peaks).
    peak_compact_tiers: tuple[int, ...] = (16,)
    # How the decode reads PAF values at the line-integral sample points:
    # "scalespace" evaluates the scale-averaged bilinear pyramid directly
    # on the per-scale low-res network outputs (never materialises the
    # 38-channel full-res upsample; see decode/scalespace.py),
    # "fullres" samples the materialised averaged map (the reference's
    # literal dataflow). Same sample points, same interpolant; values
    # differ only by ~bf16 eps (scalespace accumulates in f32).
    paf_readout: str = "scalespace"
    # Greedy acceptance packs valid connections into the leading slots, so
    # capping the per-limb table truncates only beyond this many people.
    # Default equals max_peaks (no truncation within capacity); deployments
    # may lower it to shorten the sequential assembly scan.
    max_connections: int = 96   # per limb, bounds the assembly scan
    # Batched decode tier granularity: the pair/assembly tier choice is
    # per density-sorted sub-batch instead of per batch, so one crowded
    # image no longer drags every image onto its O(K^2) tier. Images are
    # argsorted by peak count on-device (no host sync), split into this
    # many contiguous groups, decoded at each group's own adaptive tier,
    # and unpermuted — bitwise identical to decode_groups=1. Values > 1
    # multiply compiled program size by ~the group count; measured
    # round 3 (experiments/grouped_decode_r3.py).
    decode_groups: int = 1
    # With decode_groups > 1, a runtime lax.cond first checks whether
    # every image in the batch already selects the SAME pair tier; if so
    # the ungrouped program runs instead (grouping cannot change any
    # tier choice then, so the argsort/permute + sub-batch dispatch —
    # the measured 12-25 % uniform-batch penalty — is pure overhead).
    # Bitwise identical either way; False always runs the grouped path.
    decode_group_adaptive: bool = True

    @property
    def num_scales(self) -> int:
        return len(self.scale_search)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Training augmentation (reference: TransformationParams)."""

    target_dist: float = 0.6
    scale_min: float = 0.5
    scale_max: float = 1.1
    max_rotate_degree: float = 40.0
    center_perturb_max: float = 40.0
    flip_prob: float = 0.5
    sigma: float = 7.0          # GT heatmap gaussian (368-space pixels)
    paf_thre: float = 8.0       # GT PAF band half-width (368-space pixels)
    # Maximum persons rasterised per sample (static shape for the on-device
    # GT path; reference loops over a python list).
    max_persons: int = 24
    # Image-warp formulation: "twopass" = gather-free dense-hat resampling
    # (~7x faster on TPU, sub-pixel different from cv2), "exact" = 4-corner
    # bilinear gather (bit-parity with cv2.warpAffine / the NumPy twin).
    warp_method: str = "twopass"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop (reference: training/train_pose.py + optimizers.py)."""

    batch_size: int = 10
    base_lr: float = 4e-5
    momentum: float = 0.9
    weight_decay: float = 5e-4
    # global-norm gradient clipping; None reproduces the reference exactly
    # (it has none), a finite value stabilises from-scratch training
    clip_norm: float | None = None
    # gradient accumulation: effective batch = batch_size * accum_steps
    # (optax.MultiSteps; 1 = off, the reference has no equivalent)
    accum_steps: int = 1
    lr_gamma: float = 0.333
    lr_step: int = 136106       # iterations per LR step (reference stepsize)
    max_steps: int = 600000
    # Per-group LR multipliers, the MultiSGD contract (SURVEY.md C16):
    # {vgg: 1 (or 0 == frozen for domain adaptation), cpm: (1w, 2b),
    #  stage1: (1w, 2b), stageT: (4w, 8b)}.
    vgg_lr_mult: float = 1.0
    cpm_w_mult: float = 1.0
    cpm_b_mult: float = 2.0
    stage1_w_mult: float = 1.0
    stage1_b_mult: float = 2.0
    stageT_w_mult: float = 4.0
    stageT_b_mult: float = 8.0
    checkpoint_every: int = 2000
    checkpoint_dir: str = "checkpoints"
    log_every: int = 50

    def frozen_vgg(self) -> "TrainConfig":
        """Domain-adaptation variant: VGG base frozen (BASELINE.json config 5)."""
        return dataclasses.replace(self, vgg_lr_mult=0.0)


@dataclasses.dataclass(frozen=True)
class PoseConfig:
    """Top-level bundle handed to every entry point."""

    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    inference: InferenceConfig = dataclasses.field(default_factory=InferenceConfig)
    augment: AugmentConfig = dataclasses.field(default_factory=AugmentConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


DEFAULT = PoseConfig()


def single_scale(cfg: PoseConfig | None = None) -> PoseConfig:
    """Convenience: realtime-style single-scale inference (reference demo_camera)."""
    cfg = cfg or DEFAULT
    return dataclasses.replace(
        cfg, inference=dataclasses.replace(cfg.inference, scale_search=(1.0,))
    )


def with_scales(scales: Sequence[float], cfg: PoseConfig | None = None) -> PoseConfig:
    cfg = cfg or DEFAULT
    return dataclasses.replace(
        cfg, inference=dataclasses.replace(cfg.inference, scale_search=tuple(scales))
    )
