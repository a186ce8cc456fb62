"""Serving-path benchmark: DepthEstimator request latency + batched throughput.

bench.py measures the raw jitted forward; this measures what a deployment
actually observes through `atvsnet_tpu.serving.DepthEstimator` (the persistent
compiled-session API the reference has no analogue of — its drivers rebuild the
TF graph per process, reference atvsnet/example.py:51-302): host preprocessing
(scale/crop/normalize), H2D, the compiled bucket program, D2H and un-padding,
per request. Reports warm per-request latency percentiles for predict() and
predict_many() batched throughput, one JSON line at the end.

Usage:
    python tools/bench_serving.py [--requests 20] [--many 4] [--view_num 5] \
        [--max_d 128] [--max_h 480] [--max_w 896] [--dtype bfloat16] \
        [--act-quant int8s] [--warp-quant int8] [--preprocessed]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=20, help="warm predict() calls timed")
    ap.add_argument("--many", type=int, default=4, help="predict_many() batch size (0 = skip)")
    ap.add_argument("--view_num", type=int, default=5)
    ap.add_argument("--max_d", type=int, default=128)
    ap.add_argument("--max_h", type=int, default=480)
    ap.add_argument("--max_w", type=int, default=896)
    ap.add_argument("--in_h", type=int, default=None,
                    help="request image height (default: bucket max_h; a different "
                         "value exercises the scale/crop preprocessing)")
    ap.add_argument("--in_w", type=int, default=None)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--act-quant", default="int8s",
                    choices=["none", "int8", "int8s", "int8mxu"])
    ap.add_argument("--warp-quant", default="int8", choices=["none", "int8"])
    ap.add_argument("--params", default=None)
    ap.add_argument("--mesh", default=None, help='e.g. "data=2,view=4"')
    ap.add_argument("--preprocessed", action="store_true",
                    help="skip host preprocessing (inputs already at bucket shape) — "
                         "isolates the device round-trip from the scale/crop cost")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from atvsnet_tpu.utils.runtime import setup_jax

    setup_jax()

    from atvsnet_tpu.config import PipelineConfig
    from atvsnet_tpu.data.synthetic import synthetic_scene
    from atvsnet_tpu.serving import DepthEstimator

    cfg = PipelineConfig(
        view_num=args.view_num, max_d=args.max_d, max_h=args.max_h, max_w=args.max_w,
        compute_dtype=args.dtype, act_quant=args.act_quant, warp_quant=args.warp_quant,
    )
    est = DepthEstimator(cfg, params_path=args.params, mesh=args.mesh)
    t_compile = est.warmup()

    in_h = args.in_h or args.max_h
    in_w = args.in_w or args.max_w
    if args.preprocessed and (in_h, in_w) != (args.max_h, args.max_w):
        ap.error("--preprocessed requires the input to be exactly the bucket shape")
    images_a, cams_a = synthetic_scene(args.view_num, H=in_h, W=in_w, D=args.max_d, seed=0)
    images = [images_a[0, v] for v in range(args.view_num)]
    cams = [cams_a[0, v] for v in range(args.view_num)]
    kw = {"preprocessed": True} if args.preprocessed else {}

    est.predict(images, cams, **kw)  # steady-state entry (donation/cache warm)
    lat = []
    for _ in range(args.requests):
        t0 = time.perf_counter()
        est.predict(images, cams, **kw)
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat)
    p50, p95 = float(np.percentile(lat, 50)), float(np.percentile(lat, 95))

    many_throughput = None
    if args.many:
        reqs = [(images, cams)] * args.many
        est.predict_many(reqs)  # warm the batched program
        t0 = time.perf_counter()
        est.predict_many(reqs)
        many_throughput = args.many / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "serving_predict_latency_p50",
        "value": round(p50, 4),
        "unit": "s/request",
        "p95": round(p95, 4),
        "mean": round(float(lat.mean()), 4),
        "requests_per_s": round(1.0 / lat.mean(), 4),
        "predict_many_maps_per_s": round(many_throughput, 4) if many_throughput else None,
        "compile_s": round(t_compile, 1),
        "config": f"{args.view_num}v {args.max_h}x{args.max_w} D{args.max_d} "
                  f"{args.dtype} act={args.act_quant} warp={args.warp_quant} "
                  f"in={in_h}x{in_w} preprocessed={args.preprocessed}",
    }))


if __name__ == "__main__":
    main()
