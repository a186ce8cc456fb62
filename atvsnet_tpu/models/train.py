"""Training extension — the reference ships inference only (SURVEY.md §0: no optimizer
or loss exists anywhere in the repo), so this is new capability, not a port: masked-L1
depth supervision in sweep (inverse-depth) space over the initial, aggregated and
refined depth maps, optax Adam, and a mesh-sharded train step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atvsnet_tpu import numerics
from atvsnet_tpu.config import PipelineConfig, TrainConfig
from atvsnet_tpu.geometry.warp import transform_depth, warp_by_depth
from atvsnet_tpu.parallel.pipeline import multi_view_forward_spmd


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    chain = []
    if tcfg.grad_clip_norm:
        chain.append(optax.clip_by_global_norm(tcfg.grad_clip_norm))
    if tcfg.weight_decay:
        chain.append(optax.add_decayed_weights(tcfg.weight_decay))
    if tcfg.lr_schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if tcfg.warmup_steps else tcfg.learning_rate,
            peak_value=tcfg.learning_rate,
            warmup_steps=tcfg.warmup_steps,
            decay_steps=tcfg.decay_steps,
            end_value=tcfg.learning_rate * tcfg.lr_final_fraction,
        )
    else:
        lr = tcfg.learning_rate
    chain.append(optax.adam(lr))
    return optax.chain(*chain)


def masked_l1(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    interval: jnp.ndarray,
    extra_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean |pred - gt| / depth_interval over gt-valid pixels (MVSNet-style).

    pred, gt: (B, h, w, 1) in sweep space; interval: (B,); extra_mask: optional
    additional (B, h, w, 1) validity (e.g. warp in-bounds mask).
    """
    valid = (gt > 0).astype(jnp.float32)
    if extra_mask is not None:
        valid = valid * extra_mask.astype(jnp.float32)
    err = jnp.abs(pred.astype(jnp.float32) - gt.astype(jnp.float32)) * valid
    scale = interval.astype(jnp.float32)[:, None, None, None]
    return jnp.sum(err / scale) / jnp.maximum(jnp.sum(valid), 1.0)


def training_loss(
    params: dict,
    batch: dict,
    cfg: PipelineConfig,
    tcfg: TrainConfig,
    mesh: Mesh | None = None,
):
    """batch: images (B,N,H,W,3), cams (B,N,2,4,4), depth_gt (B,h,w,1) sweep-space."""
    # upsample=False: the loss reads only native-resolution maps, and the 4x
    # upsampled soft-argmin chain cannot be DCE'd through its row-tiled lax.map
    # (models/atvsnet.py:46-51) — it would cost ~3x the rest of stage 4 per step
    need_conf = tcfg.loss_weight_confidence > 0
    out = multi_view_forward_spmd(
        params, batch["images"], batch["cams"], cfg, mesh, upsample=False,
        out_prob_map=need_conf,
    )
    interval = batch["cams"][:, 0, 1, 3, 1]
    gt = batch["depth_gt"]
    loss = (
        tcfg.loss_weight_agg * masked_l1(out["depth_agg_initial"], gt, interval)
        + tcfg.loss_weight_refined * masked_l1(out["depth"], gt, interval)
    )
    metrics_extra = {}
    if need_conf:
        # peakiness: maximize the 4-bin confidence at the regressed depth over
        # gt-valid pixels (the quantity the fusion prob filter thresholds);
        # the L1 terms alone are indifferent to softmax concentration
        valid = (gt > 0).astype(jnp.float32)
        conf = out["confidence"].astype(jnp.float32)
        conf_mean = jnp.sum(conf * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        loss = loss + tcfg.loss_weight_confidence * (1.0 - conf_mean)
        metrics_extra["confidence"] = conf_mean
    if "depth_views_gt" in batch:
        # multi-depth samples (preprocess_mvs_syn.py:485-582 layout) carry every
        # view's OWN-frame gt — supervise the swapped depths directly, no warping
        gt_views = jnp.moveaxis(batch["depth_views_gt"], 1, 0)  # (P, B, h, w, 1)
        aux = jax.vmap(lambda d, g: masked_l1(d, g, interval))(
            out["depth_views"], gt_views
        ).mean()
    else:
        aux = aux_view_loss(out["depth_views"], batch["cams"], gt, interval, cfg)
    loss = loss + tcfg.loss_weight_initial * aux
    return loss, {"loss": loss, "loss_aux": aux, **metrics_extra}


def aux_view_loss(
    depth_views: jnp.ndarray,
    cams: jnp.ndarray,
    gt: jnp.ndarray,
    interval: jnp.ndarray,
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """Auxiliary supervision of the per-pair swapped depths.

    depth_views[p] lives on VIEW p+1's pixel grid in view p+1's frame, so it cannot
    be compared to the reference-frame gt directly. Re-express it in the reference
    frame (transform_depth) and resample it onto the reference grid at the gt
    geometry (warp_by_depth, nearest) — the same machinery refinement's
    geo-consistency error uses (models/tvsnet.py geo_err) — then take the masked L1
    where the warp is in-bounds and both depths are valid. For view depths exactly
    consistent with gt this term is zero (tests/test_parallel.py).

    depth_views: (P, B, h, w, 1); cams: (B, N, 2, 4, 4); gt: (B, h, w, 1) sweep-space.
    """
    ref_cam = cams[:, 0]
    view_cams = jnp.moveaxis(cams[:, 1:], 1, 0)  # (P, B, 2, 4, 4)

    def view_term(depth_view, view_cam):
        dvt = transform_depth(depth_view, view_cam, ref_cam, cfg.inverse_depth)
        warped, m = warp_by_depth(
            dvt, ref_cam, view_cam, gt, cfg.inverse_depth, method="nearest", output_mask=True
        )
        valid = m.astype(jnp.float32) * (warped > 0).astype(jnp.float32)
        return masked_l1(warped, gt, interval, extra_mask=valid)

    return jax.vmap(view_term)(depth_views, view_cams).mean()


@numerics.install_scope
def train_step(
    state: TrainState,
    batch: dict,
    cfg: PipelineConfig,
    tcfg: TrainConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
):
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: training_loss(p, batch, cfg, tcfg, mesh), has_aux=True
    )(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics


def jit_sharded_train_step(mesh: Mesh, cfg: PipelineConfig, tcfg: TrainConfig, tx):
    """Full training step jitted over the mesh: params/opt replicated (the model is
    small — ~1M params), batch sharded over 'data', pair work sharded over 'view'."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    batch_shardings = {"images": data, "cams": data, "depth_gt": data}
    step = partial(train_step, cfg=cfg, tcfg=tcfg, tx=tx, mesh=mesh)
    return jax.jit(
        step,
        in_shardings=(NamedSharding(mesh, P()), batch_shardings),
        donate_argnums=(0,),
    )
