"""atvsnet_tpu — a TPU-native (JAX/XLA/Pallas) multi-view-stereo depth framework.

A ground-up rebuild of the capabilities of daiszh/A-TVSNet (reference mounted at
/root/reference; arXiv 2003.00711): plane-sweep two-view stereo with attention-based
multi-view aggregation, geometry-aware refinement, confidence filtering and multi-view
consistency fusion into point clouds.

Layering (cf. SURVEY.md §1):
  geometry/  — pure-jnp camera math: homographies, differentiable warps, soft-argmin
  nn/        — functional network modules (FEM / CRM / AAM / RefineNet)
  models/    — pipeline composition: TVSNet (2-view), ATVSNet (N-view, single jit)
  ops/       — Pallas TPU kernels for the hot paths
  parallel/  — jax.sharding mesh + shard_map pipeline for multi-chip
  data/      — MVSNet cam.txt / PFM / example / COLMAP / MVS-Synth loaders
  fusion/    — TPU consistency-check fusion + host PLY compaction (fusibile equivalent)
  eval/      — depth error metrics
  cli/       — example / eval_pointcloud / depth_fusion entry points
"""

__version__ = "0.1.0"

from atvsnet_tpu.config import PipelineConfig  # noqa: F401
