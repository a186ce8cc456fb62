"""Held-out accuracy evaluation for trained weights (VERDICT r3 item 4).

The reference's accuracy story rests on a pretrained checkpoint that is a missing
blob in this snapshot (reference atvsnet/example.py:122-124, .MISSING_LARGE_BLOBS);
this closes the accuracy loop with SELF-TRAINED weights instead: evaluate a params
npz (from `python -m atvsnet_tpu.cli.train --synthetic_planes --export_params ...`)
on held-out photo-consistent procedural scenes (seeds disjoint from training, which
draws seeds from RandomState(seed) in [0, 2^30)) and print the full 14-metric table
(eval/errors.calc_error — the reference's own oracle, eval_errors.py:25-93) next to
the random-init baseline.

Usage:
    python tools/trained_eval.py --params runs/planes_params.npz \
        [--scenes 20] [--view_num 3] [--max_d 32] [--max_h 128] [--max_w 160]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evaluate(params, cfg, scenes, fwd):
    """Mean error vector + confidence stats over held-out scenes (native res).

    Confidence stats (mean, and the fraction of gt-valid pixels clearing the
    fusion prob filter's default tau=0.8 / relaxed 0.5) quantify the peakiness
    the TrainConfig.loss_weight_confidence term targets — long L1-only training
    flattens the 4-bin confidence below tau (ROUND4.md §4)."""
    from atvsnet_tpu.eval.errors import calc_error

    errs, conf_stats = [], []
    for s in scenes:
        depth_j, conf_j = fwd(params, s["images"], s["cams"])
        depth_sweep = np.asarray(depth_j)[0, ..., 0]
        conf = np.asarray(conf_j, np.float32)[0, ..., 0]
        with np.errstate(divide="ignore"):
            depth_metric = np.where(depth_sweep > 1e-10, 1.0 / depth_sweep, 0.0)
        e, _ = calc_error(depth_metric, s["depth_gt_metric"])
        errs.append(e)
        valid = s["depth_gt"][0, ..., 0] > 0
        cv = conf[valid]
        conf_stats.append([cv.mean(), (cv >= 0.8).mean(), (cv >= 0.5).mean()])
    return np.mean(np.stack(errs), axis=0), np.mean(np.stack(conf_stats), axis=0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True)
    ap.add_argument("--scenes", type=int, default=20)
    ap.add_argument("--holdout_seed_base", type=int, default=2_000_000_000,
                    help="held-out seeds start here (training seeds are < 2^30)")
    ap.add_argument("--view_num", type=int, default=3)
    ap.add_argument("--max_d", type=int, default=32)
    ap.add_argument("--max_h", type=int, default=128)
    ap.add_argument("--max_w", type=int, default=160)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--num_spheres", type=int, default=0,
                    help="spheres per held-out scene (curved + occluding geometry; "
                         "match the training diet)")
    ap.add_argument("--json_out", default=None)
    args = ap.parse_args()

    from atvsnet_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from atvsnet_tpu.config import PipelineConfig
    from atvsnet_tpu.data.synthetic import render_multiplane_scene
    from atvsnet_tpu.eval.errors import ACC_METRICS, ERR_METRICS
    from atvsnet_tpu.models.atvsnet import multi_view_forward
    from atvsnet_tpu.models.tvsnet import init_params
    from atvsnet_tpu.utils.ckpt import load_params

    cfg = PipelineConfig(
        view_num=args.view_num, max_d=args.max_d, max_h=args.max_h, max_w=args.max_w,
        compute_dtype=args.dtype,
    )
    scenes = [
        render_multiplane_scene(
            view_num=args.view_num, H=args.max_h, W=args.max_w, D=args.max_d,
            seed=args.holdout_seed_base + i, inverse_depth=cfg.inverse_depth,
            num_spheres=args.num_spheres,
        )
        for i in range(args.scenes)
    ]
    for s in scenes:
        s["images"] = jnp.asarray(s["images"])
        s["cams"] = jnp.asarray(s["cams"])

    def _fwd(p, i, c):
        out = multi_view_forward(p, i, c, cfg, upsample=False, out_prob_map=True)
        return out["depth"], out["confidence"]

    fwd = jax.jit(_fwd)

    trained = load_params(args.params)
    random_p = init_params(jax.random.PRNGKey(0), cfg)
    e_trained, c_trained = evaluate(trained, cfg, scenes, fwd)
    e_random, c_random = evaluate(random_p, cfg, scenes, fwd)

    names = ERR_METRICS + ACC_METRICS
    print(f"\n{'metric':<22} {'random-init':>12} {'trained':>12}   (mean over "
          f"{args.scenes} held-out scenes, {args.view_num}-view "
          f"{args.max_h}x{args.max_w} D={args.max_d})")
    for n, r, t in zip(names, e_random, e_trained):
        print(f"{n:<22} {r:>12.5f} {t:>12.5f}")
    conf_names = ["conf_mean", "conf_frac_tau08", "conf_frac_tau05"]
    for n, r, t in zip(conf_names, c_random, c_trained):
        print(f"{n:<22} {r:>12.5f} {t:>12.5f}")
    summary = {
        "scenes": args.scenes,
        "config": f"{args.view_num}v {args.max_h}x{args.max_w} D{args.max_d} "
                  f"{args.dtype} spheres={args.num_spheres}",
        "trained": {n: float(v) for n, v in zip(names, e_trained)},
        "random_init": {n: float(v) for n, v in zip(names, e_random)},
        "confidence_trained": {n: float(v) for n, v in zip(conf_names, c_trained)},
        "confidence_random_init": {n: float(v) for n, v in zip(conf_names, c_random)},
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps({
        "mae_random": round(float(e_random[0]), 5),
        "mae_trained": round(float(e_trained[0]), 5),
        "inlier3_random": round(float(e_random[11]), 4),
        "inlier3_trained": round(float(e_trained[11]), 4),
        "conf_mean_trained": round(float(c_trained[0]), 4),
        "conf_frac_tau08_trained": round(float(c_trained[1]), 4),
    }))


if __name__ == "__main__":
    main()
