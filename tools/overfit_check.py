"""Gradient-correctness check: overfit a fixed synthetic batch on the device.

    python tools/overfit_check.py [--steps 120]

Trains the full pipeline (fwd + bwd through warps, CRM, attention, refinement,
soft-argmin) on ONE fixed batch; the loss must drop well below its start.
Verified on TPU v5e 2026-08-16 (geometry-correct aux view loss): 9.03 -> 3.90
over 60 steps.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from atvsnet_tpu.utils.runtime import setup_jax  # noqa: E402

setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from atvsnet_tpu.config import PipelineConfig, TrainConfig  # noqa: E402
from atvsnet_tpu.models.train import TrainState, make_optimizer, train_step  # noqa: E402
from atvsnet_tpu.models.tvsnet import init_params  # noqa: E402
from atvsnet_tpu.data.synthetic import synthetic_scene  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args()

    cfg = PipelineConfig(view_num=3, max_d=32, max_h=128, max_w=160, compute_dtype="bfloat16")
    tcfg = TrainConfig(learning_rate=args.lr)
    tx = make_optimizer(tcfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    rng = np.random.RandomState(0)
    images, cams = synthetic_scene(view_num=3, H=128, W=160, D=32, seed=7)
    gt = (0.5 + 0.05 * 32 * rng.rand(1, 32, 40, 1)).astype(np.float32)
    batch = {
        "images": jnp.asarray(images),
        "cams": jnp.asarray(cams),
        "depth_gt": jnp.asarray(gt),
    }

    step = jax.jit(lambda s, b: train_step(s, b, cfg, tcfg, tx), donate_argnums=(0,))
    losses = []
    for i in range(args.steps):
        state, m = step(state, batch)
        if (i + 1) % 20 == 0:
            losses.append(float(m["loss"]))
            print(f"step {i + 1}: loss {losses[-1]:.4f}", flush=True)
    assert losses[-1] < losses[0] * 0.7, f"loss did not drop: {losses}"
    print("overfit PASS:", [round(x, 3) for x in losses])


if __name__ == "__main__":
    main()
