"""Multi-chip SPMD variant of the A-TVSNet pipeline.

The single-chip pipeline (models/atvsnet.py) serializes the N-1 pairs with lax.scan to
bound peak HBM. Here the pair axis is materialized with vmap so it is shardable, the
pair-stacked intermediates carry `with_sharding_constraint(P('view', 'data'))`, and
XLA's SPMD partitioner places each pair's cost volume + CRM on its own mesh slice and
inserts the all-reduces that the attention aggregation needs (shared-weight sum and
softmax normalizer over views — the only cross-pair communication in the whole model).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atvsnet_tpu import numerics
from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.geometry.depth_regression import prob2depth, prob2depth_upsample
from atvsnet_tpu.models.tvsnet import (
    aam_aggregate_stacked,
    aam_output_conv,
    extract_features,
    tvsnet_base,
    tvsnet_refine,
)


@numerics.install_scope
def multi_view_forward_spmd(
    params: dict,
    images: jnp.ndarray,
    cams: jnp.ndarray,
    cfg: PipelineConfig,
    mesh: Mesh | None = None,
    out_prob_map: bool = False,
    upsample: bool = True,
):
    """Same math as models.atvsnet.multi_view_forward, pair axis vmapped + sharded.

    images (B, N, H, W, 3), cams (B, N, 2, 4, 4). When `mesh` is given, pair-stacked
    intermediates are constrained to P('view', 'data') and the batch to P('data').
    """
    B, N = images.shape[:2]
    D = cfg.max_d
    depth_start = cams[:, 0, 1, 3, 0]
    depth_interval = cams[:, 0, 1, 3, 1]

    # optional 'depth' mesh axis (SURVEY §2.3 iii): shards the D plane axis of the
    # pair-stacked volumes (P, B, D, ...) — XLA's partitioner inserts the halo
    # exchanges the 3D conv stencils and the cross-D soft-argmin reductions need.
    # An HBM-capacity alternative to remat for full-resolution training
    # (tools/depth_shard_dryrun.py measures the per-device peak).
    has_depth = mesh is not None and "depth" in mesh.axis_names

    def constrain_pairs(x):
        if mesh is None:
            return x
        spec = ("view", "data", "depth" if has_depth and x.ndim > 2 else None)
        spec = spec[: x.ndim] + (None,) * (x.ndim - len(spec))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

    def constrain_volume(x):
        """(B, D, ...) single volumes: batch over 'data', planes over 'depth'."""
        if mesh is None:
            return x
        spec = ("data", "depth" if has_depth and x.ndim > 1 else None)
        spec = spec[: x.ndim] + (None,) * (x.ndim - len(spec))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

    def constrain_batch(x):
        if mesh is None:
            return x
        spec = ("data",) + (None,) * (x.ndim - 1)
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

    features = constrain_batch(extract_features(params, images, cfg))
    shallow = constrain_batch(extract_features(params, images, cfg, shallow=True))
    ref_feature = features[:, 0]
    ref_cam = cams[:, 0]
    shallow_ref = shallow[:, 0]

    view_features = jnp.moveaxis(features[:, 1:], 1, 0)  # (P, B, h, w, F)
    view_cams = jnp.moveaxis(cams[:, 1:], 1, 0)          # (P, B, 2, 4, 4)
    view_shallow = jnp.moveaxis(shallow[:, 1:], 1, 0)

    # ---- stage 1: all pairs in parallel (sharded over 'view') ----
    # pair_batch=False: under vmap the pair axis already batches the convs; keep the
    # per-direction layout so sharding constraints and remat boundaries stay put.
    cfg_pair = cfg.replace(pair_batch=False)

    def base_pair(view_feature, view_cam):
        out = tvsnet_base(
            params, ref_feature, view_feature, ref_cam, view_cam,
            cfg_pair, depth_start, depth_interval, siamese=True,
        )
        return out.filtered_cost, out.prob_volume, out.depth_view

    if cfg.remat:
        base_pair = jax.checkpoint(base_pair)
    filtered_costs, prob_volumes, depth_views = jax.vmap(base_pair)(view_features, view_cams)
    filtered_costs = constrain_pairs(filtered_costs)   # (P, B, D, h, w, C)
    del prob_volumes

    # ---- stage 2: AAM1 (cross-view all-reduce lives inside) ----
    # aggregate on the view-LEADING (P, B, D, h, w, C) stack directly — the
    # (..., C, P) layout would relayout the largest tensor in the model twice
    # per forward (see models/atvsnet.py:89-91); the sum over axis 0 IS the
    # 'view' all-reduce under the mesh
    cost_agg = constrain_volume(aam_aggregate_stacked(params, filtered_costs, stage=1))
    prob_agg = constrain_volume(aam_output_conv(params, cost_agg, stage=1))
    depth_agg = prob2depth(prob_agg, D, depth_start, depth_interval, impl=cfg.softargmin_impl)

    # ---- stage 3: refinement per pair (sharded over 'view') ----
    # reference_compat: the reference's per-pair visual hull always reads camera 1
    # of the full stack (model.py:321-324 with view_num=2) — same as the scan
    # pipeline (models/atvsnet.py:102-104), so the two paths stay bit-identical
    hull_cam = cams[:, 1] if cfg.reference_compat else None

    def refine_pair(depth_view, view_cam, shallow_view):
        return tvsnet_refine(
            params, depth_agg, depth_view, prob_agg, cost_agg,
            ref_cam, view_cam, shallow_ref, shallow_view,
            cfg, depth_start, depth_interval, hull_view_cam=hull_cam,
        )

    if cfg.remat:
        refine_pair = jax.checkpoint(refine_pair)
    refined_probs, refined_costs = jax.vmap(refine_pair)(depth_views, view_cams, view_shallow)
    refined_costs = constrain_pairs(refined_costs)

    # ---- stage 4: AAM2 + upsampled soft-argmin ----
    cost_agg2 = aam_aggregate_stacked(params, refined_costs, stage=2)
    prob_agg2 = aam_output_conv(params, cost_agg2, stage=2)

    out = {
        "depth_agg_initial": depth_agg,
        "depth_views": depth_views,
        "refined_prob_volumes": refined_probs,
    }
    if not upsample:
        # native-resolution-only stage 4 (see models.atvsnet.multi_view_forward)
        if out_prob_map:
            depth, conf = prob2depth(
                prob_agg2, D, depth_start, depth_interval, True, impl=cfg.softargmin_impl
            )
            out["confidence"] = constrain_batch(conf)
        else:
            depth = prob2depth(prob_agg2, D, depth_start, depth_interval, impl=cfg.softargmin_impl)
        out["depth"] = constrain_batch(depth)
        return out
    if out_prob_map:
        depth, depth_up, conf, conf_up = prob2depth_upsample(
            prob_agg2, D, depth_start, depth_interval, out_prob_map=True,
            impl=cfg.softargmin_impl,
        )
        out["confidence"] = constrain_batch(conf)
        out["confidence_up"] = constrain_batch(conf_up)
    else:
        depth, depth_up = prob2depth_upsample(
            prob_agg2, D, depth_start, depth_interval, impl=cfg.softargmin_impl
        )
    out["depth"] = constrain_batch(depth)
    out["depth_up"] = constrain_batch(depth_up)
    return out


def jit_sharded_forward(mesh: Mesh, cfg: PipelineConfig):
    """Jitted forward with params replicated, inputs sharded over 'data'."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    fn = partial(multi_view_forward_spmd, cfg=cfg, mesh=mesh)
    return jax.jit(fn, in_shardings=(repl, data, data))
