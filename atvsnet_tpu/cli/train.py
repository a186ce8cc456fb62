"""Training CLI — new capability (the reference ships no training, SURVEY.md §0).

    python -m atvsnet_tpu.cli.train --data_root <mvs_syn_base> --steps 1000 \
        --ckpt runs/state.npz [--resume] [--mesh data=2,view=4]

Data: an MVS-Synth/DeMoN-layout dataset (data/mvs_syn.py); with --synthetic, trains on
a procedurally generated random-texture plane scene (smoke/perf testing without data).
Supervision: masked L1 in sweep (inverse-depth) space on the aggregated and refined
depth maps + per-pair auxiliary (models/train.py). Checkpoints the FULL TrainState
(params + optimizer + step) for resume.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from atvsnet_tpu.config import PipelineConfig, TrainConfig
from atvsnet_tpu.utils import log


def synthetic_batch(cfg: PipelineConfig, rng: np.random.RandomState):
    from atvsnet_tpu.data.synthetic import synthetic_scene

    images, cams = synthetic_scene(
        view_num=cfg.view_num, H=cfg.max_h, W=cfg.max_w, D=cfg.max_d,
        seed=rng.randint(1 << 30),
    )
    h, w = cfg.max_h // 4, cfg.max_w // 4
    gt = (0.5 + 0.05 * cfg.max_d * rng.rand(1, h, w, 1)).astype(np.float32)
    return {"images": images, "cams": cams, "depth_gt": gt}


def planes_batch(cfg: PipelineConfig, rng: np.random.RandomState, num_spheres: int = 0):
    """Photo-consistent procedural scene (data/synthetic.render_multiplane_scene):
    real MVS supervision without a dataset — the accuracy-demonstration path while
    the reference checkpoint blob is missing (example.py:122-124). num_spheres > 0
    adds curved, occluding geometry (VERDICT r4 item 2)."""
    from atvsnet_tpu.data.synthetic import render_multiplane_scene

    s = render_multiplane_scene(
        view_num=cfg.view_num, H=cfg.max_h, W=cfg.max_w, D=cfg.max_d,
        seed=rng.randint(1 << 30), inverse_depth=cfg.inverse_depth,
        num_spheres=num_spheres,
    )
    return {"images": s["images"], "cams": s["cams"], "depth_gt": s["depth_gt"]}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", default=None, help="dataset root (layout per --dataset)")
    ap.add_argument(
        "--dataset", default="mvs_syn", choices=["mvs_syn", "colmap"],
        help="mvs_syn: MVS-Synth/DeMoN layout (data/mvs_syn.py); colmap: ETH3D "
        "COLMAP-sparse layout (data/colmap_train.py, needs --gt_root)",
    )
    ap.add_argument("--gt_root", default=None, help="ETH3D gt depth root (colmap dataset)")
    ap.add_argument(
        "--scenes", default=None,
        help="comma-separated scene list (colmap dataset; default: the 5 ETH3D "
        "training scenes, preprocess_colmap.py:404-406)",
    )
    ap.add_argument(
        "--multi_depth", action="store_true",
        help="mvs_syn: also load per-view gt depths and supervise the swapped "
        "per-pair depths directly (preprocess_mvs_syn.py:485-582 sample layout)",
    )
    ap.add_argument("--synthetic", action="store_true", help="train on synthetic data")
    ap.add_argument(
        "--synthetic_planes", action="store_true",
        help="train on photo-consistent procedural multiplane scenes "
        "(data/synthetic.render_multiplane_scene) — learns real multi-view "
        "matching, unlike --synthetic's random-texture smoke data",
    )
    ap.add_argument(
        "--num_spheres", type=int, default=0,
        help="with --synthetic_planes: add this many textured spheres per scene "
        "(curved surfaces + occlusion boundaries between objects — the non-planar "
        "geometry the refinement/visual-hull stages target)",
    )
    ap.add_argument(
        "--export_params", default=None,
        help="also save a params-only npz (consumable by example/eval --params)",
    )
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--view_num", type=int, default=3)
    ap.add_argument("--max_d", type=int, default=32)
    ap.add_argument("--max_h", type=int, default=128)
    ap.add_argument("--max_w", type=int, default=160)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr_schedule", default="constant", choices=["constant", "cosine"],
                    help="cosine = linear warmup then cosine decay "
                         "(TrainConfig; schedule step lives in the optimizer "
                         "state, so --resume continues it)")
    ap.add_argument("--warmup_steps", type=int, default=0)
    ap.add_argument("--decay_steps", type=int, default=None,
                    help="cosine horizon; defaults to --steps")
    ap.add_argument("--lr_final_fraction", type=float, default=0.01)
    ap.add_argument("--conf_weight", type=float, default=0.0,
                    help="peakiness term weight (TrainConfig.loss_weight_confidence): "
                         "keeps the 4-bin confidence maps sharp under long training "
                         "so the fusion prob filter's default tau stays usable")
    ap.add_argument("--ckpt", default="runs/train_state.npz")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize per-pair stages under AD "
                         "(PipelineConfig.remat): trades FLOPs for HBM so larger "
                         "train shapes fit one chip")
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--ckpt_every", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from atvsnet_tpu.utils.runtime import setup_jax

    setup_jax()

    from atvsnet_tpu.models.train import TrainState, make_optimizer, train_step
    from atvsnet_tpu.models.tvsnet import init_params
    from atvsnet_tpu.utils.ckpt import load_train_state, save_train_state

    cfg = PipelineConfig(
        view_num=args.view_num, max_d=args.max_d, max_h=args.max_h, max_w=args.max_w,
        compute_dtype=args.dtype, remat=args.remat,
    )
    tcfg = TrainConfig(
        learning_rate=args.lr, lr_schedule=args.lr_schedule,
        warmup_steps=args.warmup_steps,
        decay_steps=args.decay_steps if args.decay_steps is not None else args.steps,
        lr_final_fraction=args.lr_final_fraction,
        loss_weight_confidence=args.conf_weight,
    )
    tx = make_optimizer(tcfg)

    params = init_params(jax.random.PRNGKey(args.seed), cfg)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    if args.resume and os.path.exists(args.ckpt):
        state = load_train_state(args.ckpt, state)
        log.info(f"resumed from {args.ckpt} at step {int(state.step)}")

    rng = np.random.RandomState(args.seed)
    if args.synthetic_planes:
        log.info(
            "training on photo-consistent procedural multiplane scenes"
            + (f" (+{args.num_spheres} spheres)" if args.num_spheres else "")
        )
        next_batch = lambda: planes_batch(cfg, rng, args.num_spheres)  # noqa: E731
    elif args.data_root and not args.synthetic and args.dataset == "colmap":
        from atvsnet_tpu.data.colmap_train import (
            eth3d_training_samples,
            load_colmap_training_sample,
        )

        if not args.gt_root:
            ap.error("--dataset colmap requires --gt_root")
        samples, sparses = eth3d_training_samples(
            args.data_root, args.gt_root, cfg.view_num,
            scenes=args.scenes.split(",") if args.scenes else None,
        )
        log.info(f"{len(samples)} COLMAP training samples")

        def next_batch():
            s = samples[rng.randint(len(samples))]
            return load_colmap_training_sample(
                sparses[s.scene_idx], s.ref_id, s.view_ids, s.gt_depth_path,
                max_d=cfg.max_d, max_h=cfg.max_h, max_w=cfg.max_w,
                inverse_depth=cfg.inverse_depth, augment_rng=rng,
            )

    elif args.data_root and not args.synthetic:
        from atvsnet_tpu.data.mvs_syn import MvsSynDataset, load_training_sample

        ds = MvsSynDataset(args.data_root, num_neighbors=cfg.view_num - 1, seed=args.seed)
        sample_ids = list(ds.training_samples(cfg.view_num))
        log.info(f"{len(sample_ids)} training samples")

        def next_batch():
            ids, _aug = sample_ids[rng.randint(len(sample_ids))]
            return load_training_sample(
                ds, ids, max_d=cfg.max_d, inverse_depth=cfg.inverse_depth,
                augment_rng=rng, multi_depth=args.multi_depth,
            )

    else:
        log.warn("training on synthetic data (--synthetic or no --data_root)")
        next_batch = lambda: synthetic_batch(cfg, rng)  # noqa: E731

    step_fn = jax.jit(lambda s, b: train_step(s, b, cfg, tcfg, tx), donate_argnums=(0,))

    os.makedirs(os.path.dirname(args.ckpt) or ".", exist_ok=True)
    t0 = time.time()
    start = int(state.step)
    # one-deep host prefetch: the synthetic renders / file loads are pure-host
    # work that would otherwise stall the device between steps
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)
    try:
        pending = pool.submit(next_batch)
        for i in range(start, args.steps):
            host_batch = pending.result()
            if i + 1 < args.steps:  # last step: nothing left to prefetch
                pending = pool.submit(next_batch)
            batch = {k: jnp.asarray(v) for k, v in host_batch.items()}
            state, metrics = step_fn(state, batch)
            if (i + 1) % args.log_every == 0:
                loss = float(metrics["loss"])
                rate = (i + 1 - start) / (time.time() - t0)
                conf = f" conf {float(metrics['confidence']):.3f}" if "confidence" in metrics else ""
                log.info(f"step {i + 1}/{args.steps} loss {loss:.4f}{conf} ({rate:.2f} it/s)")
            if (i + 1) % args.ckpt_every == 0 or (i + 1) == args.steps:
                save_train_state(args.ckpt, state)
    finally:
        pool.shutdown(wait=False, cancel_futures=True)
    save_train_state(args.ckpt, state)
    log.info(f"final state saved to {args.ckpt}")
    if args.export_params:
        from atvsnet_tpu.utils.ckpt import save_params

        os.makedirs(os.path.dirname(args.export_params) or ".", exist_ok=True)
        save_params(args.export_params, jax.device_get(state.params))
        log.info(f"params exported to {args.export_params}")


if __name__ == "__main__":
    main()
