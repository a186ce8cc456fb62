"""A-TVSNet — the full N-view pipeline as ONE jitted program.

The reference splits this into four sess.run stages with host-side numpy staging of
(B, D, h, w, 8, N-1) cost volumes between them (reference atvsnet/example.py:144-181 —
its dominant overhead, SURVEY.md §3.5). Here all stages run device-resident:

  Stage 1  per-pair base nets     lax.scan over the N-1 pairs (CRM weights shared)
  Stage 2  AAM1 aggregation       attention over the stacked pair volumes
  Stage 3  per-pair refinement    lax.scan, consuming the aggregated volumes
  Stage 4  AAM2 + soft-argmin     upsampled depth + confidence maps

lax.scan keeps peak HBM at one pair's working set while XLA pipelines the stacked
outputs; the multi-chip variant in parallel/ shards the pair axis over the mesh instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from atvsnet_tpu import numerics
from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.geometry.depth_regression import prob2depth, prob2depth_upsample
from atvsnet_tpu.models.tvsnet import (
    aam_aggregate_stacked,
    aam_output_conv,
    extract_features,
    refinement,
    tvsnet_base,
    tvsnet_refine,
)


@numerics.install_scope
def multi_view_forward(
    params: dict,
    images: jnp.ndarray,
    cams: jnp.ndarray,
    cfg: PipelineConfig,
    out_prob_map: bool = False,
    upsample: bool = True,
):
    """images (B, N, H, W, 3), cams (B, N, 2, 4, 4) -> depth/confidence outputs.

    Equivalent to run_test_multiview (reference example.py:51-216) / run_eval_pc
    (eval_pointcloud.py:212-397) but with zero host round-trips.

    upsample=False skips the 4x-upsampled stage-4 outputs entirely (no depth_up /
    confidence_up keys). The upsampled soft-argmin runs as a row-tiled lax.map whose
    unused outputs XLA cannot DCE through the loop, so callers that only consume the
    native-resolution maps (the ETH3D eval driver — the reference also writes only
    the native PFMs, its *_up write_pfm calls are commented out,
    eval_pointcloud.py:386-387) must opt out here rather than just dropping keys.
    """
    B, N = images.shape[:2]
    assert N == cfg.view_num and N > 2, (N, cfg.view_num)
    D = cfg.max_d
    depth_start = cams[:, 0, 1, 3, 0]
    depth_interval = cams[:, 0, 1, 3, 1]

    features = extract_features(params, images, cfg)               # (B, N, h, w, F)
    shallow = extract_features(params, images, cfg, shallow=True)  # (B, N, h, w, 16)
    ref_feature = features[:, 0]
    ref_cam = cams[:, 0]
    shallow_ref = shallow[:, 0]
    view_ids = jnp.arange(1, N)

    # ---- stage 1: per-pair base nets (reference example.py:144-151) ----
    P = N - 1

    def _tile_pairs(x, reps):
        """(B, ...) -> (reps*B, ...) — reps copies stacked on the batch axis."""
        return jnp.broadcast_to(x[None], (reps,) + x.shape).reshape((reps * B,) + x.shape[1:])

    # lax.scan over pairs bounds peak HBM at one pair's working set. cfg.pair_batch
    # batches the two siamese directions inside each step (see config.py for the
    # end-to-end measurements that keep it off by default).
    def base_step(carry, view_i):
        view_feature = jnp.take(features, view_i, axis=1)
        view_cam = jnp.take(cams, view_i, axis=1)
        out = tvsnet_base(
            params, ref_feature, view_feature, ref_cam, view_cam,
            cfg, depth_start, depth_interval, siamese=True,
        )
        return carry, (out.filtered_cost, out.prob_volume, out.depth_view)

    _, (filtered_costs, prob_volumes, depth_views) = jax.lax.scan(base_step, None, view_ids)
    # filtered_costs: (P, B, D, h, w, C); depth_views: (P, B, h, w, 1)

    # ---- stage 2: AAM1 (reference example.py:153-158) ----
    # the scan output is view-leading (P, B, D, h, w, C): aggregate in that layout
    # directly instead of transposing the ~GB stack to (..., C, P) and back
    cost_agg = aam_aggregate_stacked(params, filtered_costs, stage=1)  # (B, D, h, w, C)
    prob_agg = aam_output_conv(params, cost_agg, stage=1)          # (B, D, h, w)
    if out_prob_map:
        depth_agg, conf_agg = prob2depth(
            prob_agg, D, depth_start, depth_interval, True, impl=cfg.softargmin_impl
        )
    else:
        depth_agg = prob2depth(prob_agg, D, depth_start, depth_interval, impl=cfg.softargmin_impl)
        conf_agg = None

    # ---- stage 3: per-pair refinement (reference example.py:160-174) ----
    # reference_compat: the reference's per-pair visual hull always reads camera 1
    # of the full stack (model.py:321-324 with view_num=2); see refinement().
    hull_cam = cams[:, 1] if cfg.reference_compat else None

    if cfg.pair_batch:
        # all P refinements through ONE set of refine-net convs (the refine net is a
        # single small U-Net block — batching its latency-bound f=8 ops wins where
        # batching whole CRMs saturates); the shared aggregated volumes tile over pairs
        view_cams_f = jnp.moveaxis(cams[:, 1:], 1, 0).reshape((P * B,) + cams.shape[2:])
        shallow_views_f = jnp.moveaxis(shallow[:, 1:], 1, 0).reshape((P * B,) + shallow.shape[2:])
        dsP = jnp.tile(depth_start, P)
        diP = jnp.tile(depth_interval, P)
        cost_res, prob_res = refinement(
            params,
            _tile_pairs(depth_agg, P),
            depth_views.reshape((P * B,) + depth_views.shape[2:]),
            _tile_pairs(ref_cam, P),
            view_cams_f,
            _tile_pairs(shallow_ref, P),
            shallow_views_f,
            _tile_pairs(prob_agg, P),
            cfg, dsP, diP,
            hull_view_cam=None if hull_cam is None else _tile_pairs(hull_cam, P),
            bn_groups=P,
        )
        refined_probs = prob_agg[None] + prob_res.reshape((P, B) + prob_res.shape[1:]).astype(prob_agg.dtype)
        refined_costs = cost_agg[None] + cost_res.reshape((P, B) + cost_res.shape[1:]).astype(cost_agg.dtype)
    else:

        def refine_step(carry, inp):
            view_i, depth_view = inp
            view_cam = jnp.take(cams, view_i, axis=1)
            shallow_view = jnp.take(shallow, view_i, axis=1)
            refined_prob, refined_cost = tvsnet_refine(
                params, depth_agg, depth_view, prob_agg, cost_agg,
                ref_cam, view_cam, shallow_ref, shallow_view,
                cfg, depth_start, depth_interval, hull_view_cam=hull_cam,
            )
            return carry, (refined_prob, refined_cost)

        _, (refined_probs, refined_costs) = jax.lax.scan(
            refine_step, None, (view_ids, depth_views)
        )

    # ---- stage 4: AAM2 + upsampled soft-argmin (reference example.py:176-181) ----
    cost_agg2 = aam_aggregate_stacked(params, refined_costs, stage=2)
    prob_agg2 = aam_output_conv(params, cost_agg2, stage=2)
    depth_refined_up = conf = conf_up = None
    if upsample:
        if out_prob_map:
            depth_refined, depth_refined_up, conf, conf_up = prob2depth_upsample(
                prob_agg2, D, depth_start, depth_interval, out_prob_map=True,
                impl=cfg.softargmin_impl,
            )
        else:
            depth_refined, depth_refined_up = prob2depth_upsample(
                prob_agg2, D, depth_start, depth_interval, impl=cfg.softargmin_impl
            )
    else:
        if out_prob_map:
            depth_refined, conf = prob2depth(
                prob_agg2, D, depth_start, depth_interval, True, impl=cfg.softargmin_impl
            )
        else:
            depth_refined = prob2depth(
                prob_agg2, D, depth_start, depth_interval, impl=cfg.softargmin_impl
            )

    out = {
        "depth": depth_refined,              # (B, h, w, 1) — sweep-space (inverse depth)
        "depth_agg_initial": depth_agg,
        "prob_volume_agg": prob_agg,
        "prob_volumes": prob_volumes,        # (P, B, D, h, w) per-pair stage-1 volumes
        "refined_prob_volumes": refined_probs,
        "depth_views": depth_views,
    }
    if upsample:
        out["depth_up"] = depth_refined_up   # (B, 4h, 4w, 1)
    if out_prob_map:
        out["confidence"] = conf
        out["confidence_agg_initial"] = conf_agg
        if upsample:
            out["confidence_up"] = conf_up
    return out


def center_images(images: jnp.ndarray) -> jnp.ndarray:
    """Per-image, per-channel variance normalization on device.

    Same statistics as data.preprocess.center_image (reference preprocess.py:20-25:
    population std, eps 1e-8), for drivers that ship raw uint8 frames and normalize
    in-jit — ~4x fewer H2D bytes and no fp32 host pass, which is what one-vCPU eval
    hosts are starved of. images: (..., H, W, C), any dtype.
    """
    x = images.astype(jnp.float32)
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=(-3, -2), keepdims=True) - mean * mean, 0.0)
    return (x - mean) / (jnp.sqrt(var) + 1e-8)


def sweep_to_depth(depth_sweep: jnp.ndarray, inverse_depth: bool = True, eps: float = 1e-10) -> jnp.ndarray:
    """Convert soft-argmin output from sweep space to metric depth.

    Reference example.py:184-186: non-positive inverse depths become 0 (infinite
    depth replaced by 1/inf); identity when the sweep is already metric.
    """
    if not inverse_depth:
        return depth_sweep
    return jnp.where(depth_sweep < eps, 0.0, 1.0 / jnp.maximum(depth_sweep, eps))
