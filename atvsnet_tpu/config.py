"""Typed configuration for the whole pipeline.

Replaces the reference's `tf.app.flags` global singleton (flags defined per-driver and
consumed deep inside library code, e.g. FLAGS.inverse_depth read inside every geometry
op at reference atvsnet/homography_warping.py:149,215,301; FLAGS.batch_size inside
prob2depth at atvsnet/model.py:96). Here one frozen dataclass is threaded explicitly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static configuration — every field participates in jit cache keys.

    Defaults mirror the reference drivers (example.py:25-48, eval_pointcloud.py:38-58).
    """

    # Number of input images: 1 reference + (view_num - 1) neighbor views.
    view_num: int = 5
    # Depth hypothesis planes in the sweep.
    max_d: int = 128
    # Maximum input image size; inputs are center-cropped/scaled to multiples of 32
    # (reference preprocess.py:63-92) so that the 1/4-res cost volume is 8-divisible
    # for the 3-level 3D U-Net.
    max_h: int = 480
    max_w: int = 896
    # Cost volume is built at this scale of the input image (FEM downsamples 4x).
    sample_scale: float = 0.25
    # Sweep in inverse depth (disparity); the reference checkpoint and all drivers
    # assume True (example.py:47).
    inverse_depth: bool = True
    batch_size: int = 1

    # --- numerics ---
    # dtype for conv/matmul compute (bfloat16 rides the MXU at 2x); geometry ops,
    # softmax-argmin and normalization statistics always run in float32.
    compute_dtype: str = "float32"
    # batch-norm epsilon (tf.layers.batch_normalization default, reference
    # cnn_wrapper/network.py:206).
    bn_eps: float = 1e-3
    # rematerialize per-pair stages under AD (jax.checkpoint): trades FLOPs for HBM so
    # full-resolution training fits; no effect on inference.
    remat: bool = False
    # Batch weight-shared sweeps through ONE set of CRM/refine convs (the 2 siamese
    # directions of each stage-1 pair, the N-1 refinements of stage 3) with per-sweep
    # BN statistics (exact; equivalence-tested). Isolated ops DO scale sublinearly on
    # v5e (CRM pass 30.8ms -> 47.9 at B=2, warp 8x21.9 -> 130.5 at B=8) but the full
    # pipeline measures SLOWER (cached steady-state 1.955 maps/s scan baseline vs
    # 1.898 batched; the fully-batched-2P variant 1.646) — the batched gathers and
    # concat/layout glue outweigh the dispatch savings, and the 2P variant adds
    # HBM-pressure copies. Default OFF; kept as a measured, tested alternative for
    # other shapes/hardware.
    pair_batch: bool = False
    # Soft-argmin implementation: "auto" uses the fused Pallas kernel on TPU
    # (ops/softargmin.py, measured 1.89ms vs 2.48ms XLA at the eval shape) and XLA
    # elsewhere; "pallas"/"xla" force one.
    softargmin_impl: str = "auto"
    # --- numerics policy (trace-scoped via atvsnet_tpu.numerics; VERDICT r3 item 2:
    # formerly ATVSNET_* process env vars read inside traced code — moved here so
    # they participate in jit cache keys and serving bucket identity) ---
    # int8 activation storage for 5D volume conv_bn/deconv_bn links
    # (nn/layers._maybe_quant_act): none|int8|int8s|int8mxu. int8s = static
    # 6-sigma lattice fused into the BN pass; int8mxu additionally runs
    # provenance-audited volume convs with int8 operands on the MXU's native
    # int8 path. INFERENCE-ONLY (zero gradient through round()).
    act_quant: str = "none"
    # static-lattice clip range in BN-output sigmas
    act_quant_range: float = 6.0
    # int8 storage for bilinear plane-sweep warped feature volumes
    # (geometry/warp._maybe_quant_warp): none|int8. Exact per-(sample, channel)
    # scale bound from the 2D source map; independent of act_quant.
    warp_quant: str = "none"
    # fp32 conv MXU pass count (nn/layers._precision_for): highest (6-pass bf16
    # expansion) | high (3-pass, ~tf32) | default (1-pass). Only affects
    # compute_dtype="float32" runs.
    fp32_precision: str = "highest"
    # scoped-VMEM limit the Pallas soft-argmin sizes its blocks against (KiB);
    # set when changing xla_tpu_scoped_vmem_limit_kib so block sizing tracks the
    # real limit. None = the TPU compiler default (16 MiB).
    scoped_vmem_kib: Optional[int] = None

    # Reproduce the reference's per-pair visual-hull camera-indexing bug: refinement
    # passes the FULL cams stack into get_visual_hull with view_num=2
    # (reference atvsnet/model.py:321-324 + homography_warping.py:344-358), so the
    # hull's view-depth term always uses camera index 1 even for pairs (0,2)..(0,N-1).
    # The published checkpoint was trained with this behavior — enable for
    # bit-comparable outputs with reference-trained weights. Default False uses the
    # pair's own cameras (geometrically correct).
    reference_compat: bool = False

    # --- fusion (depth_fusion.py defaults, reference atvsnet/depth_fusion.py:230-235
    # and hardcoded values at :210-212) ---
    prob_threshold: float = 0.8
    disp_threshold: float = 0.01
    num_consistent: int = 2
    # depth range pre-filter (cli/depth_fusion.py defaults; the reference parses the
    # matching --depth_min/--depth_max but its kernel consumers are commented out,
    # fusibile.cu:364-365 — here they actually filter, fusion/consistency.py)
    fusion_depth_min: float = 0.01
    fusion_depth_max: float = 100000.0
    # normal-angle consistency threshold, consumed by fuse_depth_maps(normals=...);
    # 360 deg == disabled (the pipeline uses fake normals, depth_fusion.py:92-111)
    fusion_normal_threshold_deg: float = 360.0

    # --- network widths (reference cnn_wrapper/atvsnet.py) ---
    fem_base_filter: int = 32     # ResNetDS2SPP base (atvsnet.py:256)
    crm_base_filter: int = 8      # StackedUNet base (atvsnet.py:7)
    shallow_base_filter: int = 16  # ResNetDS2SPP_shallow_f16 (atvsnet.py:247)
    refine_base_filter: int = 8   # CostVolRefineNet base (atvsnet.py:297)

    def __post_init__(self):
        # the 3-level stride-2 U-Nets (CRM/refine) need the depth axis and the
        # 1/4-res spatial dims divisible by 8 -> inputs divisible by 32 (the same
        # constraint the reference's crop enforces, preprocess.py:63); validate
        # here so a bad config fails with a clear message, not a deep shape error
        if self.max_d % 8 != 0:
            raise ValueError(f"max_d must be a multiple of 8, got {self.max_d}")
        if self.max_h % 32 != 0 or self.max_w % 32 != 0:
            raise ValueError(
                f"max_h/max_w must be multiples of 32, got {self.max_h}x{self.max_w}"
            )
        if self.view_num < 2:
            raise ValueError(f"view_num must be >= 2, got {self.view_num}")
        self.numerics()  # validate the numerics fields eagerly

    def numerics(self):
        """The trace-scoped numerics policy for this config (atvsnet_tpu.numerics)."""
        from atvsnet_tpu.numerics import NumericsPolicy

        return NumericsPolicy(
            act_quant=self.act_quant,
            act_quant_range=self.act_quant_range,
            warp_quant=self.warp_quant,
            fp32_precision=self.fp32_precision,
            scoped_vmem_kib=self.scoped_vmem_kib,
        )

    @property
    def dtype(self) -> jnp.dtype:
        return jnp.dtype(self.compute_dtype)

    @property
    def num_pairs(self) -> int:
        return self.view_num - 1

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training extension (the reference ships inference only — SURVEY.md §0)."""

    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    # Relative weights of the supervision terms on the initial (per-pair), aggregated
    # and refined depth maps.
    loss_weight_initial: float = 0.5
    loss_weight_agg: float = 1.0
    loss_weight_refined: float = 1.0
    grad_clip_norm: Optional[float] = 1.0
    # Peakiness term on the aggregated probability volume: adds
    # loss_weight_confidence * (1 - mean 4-bin confidence over gt-valid pixels).
    # Masked L1 on the EXPECTED depth is indifferent to how concentrated the
    # softmax is, so long training flattens the confidence maps (measured:
    # max prob 0.885 after 10k steps — nothing clears the reference pipeline's
    # tau=0.8 fusion default, ROUND4.md §4); this term restores the incentive.
    loss_weight_confidence: float = 0.0
    # LR schedule: 'constant' or 'cosine' (linear warmup over warmup_steps, then
    # cosine decay to lr_final_fraction * learning_rate at decay_steps; the
    # optimizer reads the step from its own optax count, so --resume continues
    # the schedule where it stopped).
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    decay_steps: int = 10_000
    lr_final_fraction: float = 0.01

    def __post_init__(self):
        if self.lr_schedule not in ("constant", "cosine"):
            raise ValueError(f"lr_schedule must be constant|cosine, got {self.lr_schedule!r}")
        if self.decay_steps <= 0:
            raise ValueError("decay_steps must be positive")
        if self.warmup_steps < 0:
            raise ValueError("warmup_steps must be >= 0")
        if self.loss_weight_confidence < 0:
            raise ValueError("loss_weight_confidence must be >= 0")
        if self.lr_schedule == "cosine" and self.warmup_steps >= self.decay_steps:
            # optax's decay horizon INCLUDES the warmup; warmup at or past it
            # would surface as an opaque "decay_steps=0" error inside optax
            raise ValueError(
                f"warmup_steps ({self.warmup_steps}) must be < decay_steps "
                f"({self.decay_steps}) — the cosine horizon includes the warmup"
            )
