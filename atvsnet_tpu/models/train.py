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

from atvsnet_tpu.config import PipelineConfig, TrainConfig
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
    chain.append(optax.adam(tcfg.learning_rate))
    return optax.chain(*chain)


def masked_l1(pred: jnp.ndarray, gt: jnp.ndarray, interval: jnp.ndarray) -> jnp.ndarray:
    """Mean |pred - gt| / depth_interval over gt-valid pixels (MVSNet-style).

    pred, gt: (B, h, w, 1) in sweep space; interval: (B,).
    """
    valid = (gt > 0).astype(jnp.float32)
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
    out = multi_view_forward_spmd(params, batch["images"], batch["cams"], cfg, mesh)
    interval = batch["cams"][:, 0, 1, 3, 1]
    gt = batch["depth_gt"]
    loss = (
        tcfg.loss_weight_agg * masked_l1(out["depth_agg_initial"], gt, interval)
        + tcfg.loss_weight_refined * masked_l1(out["depth"], gt, interval)
    )
    # supervise every per-pair swapped depth against the (reference-frame) gt warped?
    # the reference never trains; we supervise only reference-frame outputs and keep the
    # per-pair initial depths as an auxiliary mean term.
    aux = jax.vmap(lambda d: masked_l1(d, gt, interval))(out["depth_views"]).mean()
    loss = loss + tcfg.loss_weight_initial * aux
    return loss, {"loss": loss}


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
