"""Training-step throughput at an arbitrary shape on the attached device.

    python tools/train_bench.py --view_num 5 --max_d 128 --max_h 480 --max_w 896 \
        --remat [--batch 1] [--steps 5] [--dtype bfloat16]

Times the FULL train step (fwd + bwd through warps, CRM, attention, refinement,
soft-argmin + Adam update) steady-state, printing seconds/step. Companion to
tools/overfit_check.py (gradient correctness) and tools/depth_shard_dryrun.py
(the multi-chip HBM alternative to --remat); this one answers "what does training
cost at shape X on one chip, and does it fit".
"""

import argparse
import os
import sys
import time

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
    ap.add_argument("--view_num", type=int, default=5)
    ap.add_argument("--max_d", type=int, default=128)
    ap.add_argument("--max_h", type=int, default=480)
    ap.add_argument("--max_w", type=int, default=896)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    cfg = PipelineConfig(
        view_num=args.view_num, max_d=args.max_d, max_h=args.max_h, max_w=args.max_w,
        compute_dtype=args.dtype, remat=args.remat,
    )
    tcfg = TrainConfig()
    tx = make_optimizer(tcfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    rng = np.random.RandomState(0)
    images, cams = synthetic_scene(
        view_num=args.view_num, H=args.max_h, W=args.max_w, D=args.max_d, seed=7
    )
    if args.batch > 1:
        images = np.concatenate([images] * args.batch, axis=0)
        cams = np.concatenate([cams] * args.batch, axis=0)
    gt = (0.5 + 0.05 * args.max_d * rng.rand(args.batch, args.max_h // 4, args.max_w // 4, 1)).astype(
        np.float32
    )
    batch = {
        "images": jnp.asarray(images),
        "cams": jnp.asarray(cams),
        "depth_gt": jnp.asarray(gt),
    }

    step = jax.jit(lambda s, b: train_step(s, b, cfg, tcfg, tx), donate_argnums=(0,))
    t0 = time.perf_counter()
    state, m = step(state, batch)
    # scalar fetch is the only reliable execution fence on the axon platform
    loss0 = float(np.asarray(m["loss"]))
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s, loss {loss0:.4f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = step(state, batch)
    loss = float(np.asarray(m["loss"]))
    dt = (time.perf_counter() - t0) / args.steps
    assert np.isfinite(loss), loss
    print(
        f"train_bench: {dt:.3f} s/step ({args.batch / dt:.3f} samples/s) at "
        f"{args.view_num}v {args.max_h}x{args.max_w} D{args.max_d} B{args.batch} "
        f"{args.dtype} remat={args.remat}, loss {loss:.4f}"
    )


if __name__ == "__main__":
    main()
