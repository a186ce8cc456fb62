"""Stage-level timing breakdown of the A-TVSNet pipeline on the attached device.

Usage: python tools/profile_stages.py [--dtype bfloat16] [--iters 3]
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

from atvsnet_tpu.config import PipelineConfig  # noqa: E402
from atvsnet_tpu.geometry.homography import get_homographies  # noqa: E402
from atvsnet_tpu.geometry.warp import plane_sweep_warp  # noqa: E402
from atvsnet_tpu.geometry.depth_regression import prob2depth_upsample  # noqa: E402
from atvsnet_tpu.models.tvsnet import (  # noqa: E402
    aam_aggregate,
    build_cost_volume,
    extract_features,
    init_params,
    refinement,
    tvsnet_base,
)
from atvsnet_tpu.nn.crm import crm  # noqa: E402
from atvsnet_tpu.data.synthetic import synthetic_scene  # noqa: E402

H, W, D, N = 480, 896, 128, 5


def bench(name, fn, *args, iters=3):
    """Scalar-forced timing: block_until_ready returns before execution on the axon
    platform and full-output device_get pays ~300MB/s tunnel transfer; reduce every
    output to one scalar and materialize that (~3.5ms fixed per-call overhead)."""
    g = jax.jit(
        lambda *a: jax.tree_util.tree_reduce(
            lambda acc, leaf: acc + jnp.sum(leaf.astype(jnp.float32)),
            fn(*a),
            jnp.float32(0),
        )
    )
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:9.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    cfg = PipelineConfig(view_num=N, max_d=D, max_h=H, max_w=W, compute_dtype=args.dtype)
    params = init_params(jax.random.PRNGKey(0), cfg)
    images, cams = synthetic_scene(view_num=N, H=H, W=W, D=D)
    images = jnp.asarray(images)
    cams = jnp.asarray(cams)
    ds = cams[:, 0, 1, 3, 0]
    di = cams[:, 0, 1, 3, 1]

    feats = jax.jit(lambda p, i: extract_features(p, i, cfg))(params, images)
    shallow = jax.jit(lambda p, i: extract_features(p, i, cfg, shallow=True))(params, images)
    feats = jax.block_until_ready(feats)
    shallow = jax.block_until_ready(shallow)

    bench("features (N=5 FEM)", lambda p, i: extract_features(p, i, cfg), params, images, iters=args.iters)
    bench("shallow features", lambda p, i: extract_features(p, i, cfg, shallow=True), params, images, iters=args.iters)

    f0, f1 = feats[:, 0], feats[:, 1]
    c0, c1 = cams[:, 0], cams[:, 1]

    homos = jax.jit(lambda a, b: get_homographies(a, b, D, ds, di, True))(c0, c1)
    bench("homographies (D=128)", lambda a, b: get_homographies(a, b, D, ds, di, True), c0, c1, iters=args.iters)
    bench("plane_sweep_warp (1 view feat)", plane_sweep_warp, f1, homos, iters=args.iters)

    cost, _ = jax.jit(lambda: build_cost_volume(f0, f1, c0, c1, cfg, ds, di))()
    cost = jax.block_until_ready(cost)
    bench("build_cost_volume", lambda: build_cost_volume(f0, f1, c0, c1, cfg, ds, di)[0], iters=args.iters)
    bench("CRM (one pass)", lambda p, c: crm(p["crm"], c, eps=cfg.bn_eps), params, cost, iters=args.iters)
    bench("tvsnet_base (pair, siamese)", lambda p: [o for o in tvsnet_base(p, f0, f1, c0, c1, cfg, ds, di, True) if o is not None], params, iters=args.iters)

    base = jax.jit(lambda p: tvsnet_base(p, f0, f1, c0, c1, cfg, ds, di, True))(params)
    base = jax.block_until_ready(base)
    stacked = jnp.stack([base.filtered_cost] * (N - 1), axis=-1)
    bench("AAM1 attention (P=4)", lambda p, x: aam_aggregate(p, x, 1), params, stacked, iters=args.iters)

    bench(
        "refinement (one pair)",
        lambda p: refinement(
            p, base.depth, base.depth_view, c0, c1,
            shallow[:, 0], shallow[:, 1], base.prob_volume, cfg, ds, di,
        ),
        params,
        iters=args.iters,
    )
    bench(
        "prob2depth_upsample",
        lambda pv: prob2depth_upsample(pv, D, ds, di),
        base.prob_volume,
        iters=args.iters,
    )


if __name__ == "__main__":
    main()
