"""Benchmark: depth-maps/sec/chip on the ETH3D eval workload shape.

Workload matches the reference eval driver's per-ref-image inference
(eval_pointcloud.py:212-352): view_num=5, 480x896 input (32-multiples), 128
inverse-depth planes, full 4-stage A-TVSNet (per-pair base nets + AAM1 + per-pair
refinement + AAM2 + upsampled soft-argmin) — executed as ONE jitted program.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference repo commits no runtime numbers (BASELINE.md) and its
TF-1.5/CUDA-9 stack cannot run here. The denominator is this same workload measured on
the host CPU (our own pipeline, fp32) — the north-star's "CPU reference"
(BASELINE.json: >10x depth-maps/sec/chip vs CPU) — measured once and cached in
BENCH_CPU_BASELINE.json. If no cache exists and --with-cpu-baseline is not given, a
conservative documented anchor of 0.05 depth-maps/sec is used (a single CPU pass of
this workload measures in the tens of seconds).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

CPU_ANCHOR_DM_PER_S = 0.05
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_CPU_BASELINE.json")

VIEW_NUM = 5
H, W, D = 480, 896, 128


def _inputs(view_num: int = VIEW_NUM):
    from atvsnet_tpu.data.synthetic import synthetic_scene

    images, cams = synthetic_scene(view_num=view_num, H=H, W=W, D=D, seed=0)
    return images, cams


def measure(
    device,
    compute_dtype: str,
    iters: int = 5,
    xla_options: dict | None = None,
    pair_batch: bool = False,
    view_num: int = VIEW_NUM,
    batch: int = 1,
    act_quant: str = "none",
    warp_quant: str = "none",
    fp32_precision: str = "highest",
    scoped_vmem_kib: int | None = None,
):
    import jax
    import jax.numpy as jnp

    from atvsnet_tpu.config import PipelineConfig
    from atvsnet_tpu.models.atvsnet import multi_view_forward
    from atvsnet_tpu.models.tvsnet import init_params

    cfg = PipelineConfig(
        view_num=view_num, max_d=D, max_h=H, max_w=W, compute_dtype=compute_dtype,
        pair_batch=pair_batch,
        act_quant=act_quant, warp_quant=warp_quant, fp32_precision=fp32_precision,
        scoped_vmem_kib=scoped_vmem_kib,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    images, cams = _inputs(view_num)
    if batch > 1:
        # DISTINCT ref images on the batch axis (pure data batching; exact — BN
        # statistics are per-sample, nn/layers.batch_stat_norm)
        rng = np.random.RandomState(1)
        reps = [images] + [
            images + rng.standard_normal(images.shape).astype(images.dtype) * 0.05
            for _ in range(batch - 1)
        ]
        images = np.concatenate(reps, axis=0)
        cams = np.concatenate([cams] * batch, axis=0)

    params = jax.device_put(params, device)
    images = jax.device_put(jnp.asarray(images), device)
    cams = jax.device_put(jnp.asarray(cams), device)

    # scalar-reduced output: forces the full computation while excluding the host
    # transfer of the depth map, which on this environment crosses a ~300MB/s tunnel
    # (an artifact of the attached-TPU setup, not of the hardware). block_until_ready
    # returns before execution on the axon platform, so a scalar device_get is the
    # only reliable fence (see .claude/skills/verify/SKILL.md).
    fwd = jax.jit(
        lambda p, i, c: jnp.sum(multi_view_forward(p, i, c, cfg)["depth_up"].astype(jnp.float32)),
        compiler_options=xla_options or None,
    )
    np.asarray(fwd(params, images, cams))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, images, cams)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--with-cpu-baseline", action="store_true")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--xla-option", action="append", default=[],
        help="extra TPU compiler option key=value (repeatable), e.g. "
        "--xla-option xla_tpu_scoped_vmem_limit_kib=65536 (which also sets "
        "PipelineConfig.scoped_vmem_kib so the Pallas soft-argmin block sizing "
        "tracks the raised limit)",
    )
    ap.add_argument("--pair-batch", action="store_true")
    ap.add_argument("--view-num", type=int, default=VIEW_NUM)
    ap.add_argument("--skip-8view", action="store_true",
                    help="measure only --view-num. By default the reference eval "
                         "driver's flagship view_num=8 (eval_pointcloud.py:38-41) is "
                         "ALSO measured and reported in the same JSON line so "
                         "BENCH_r*.json regression-tracks both configs (VERDICT r4 "
                         "item 5)")
    ap.add_argument("--batch", type=int, default=1,
                    help="distinct ref images per forward (cross-image data batching). "
                         "B=1 is the measured sweet spot on v5e SINCE the warp "
                         "corner-lerp fusion: 2.81/2.51 maps/s at B=1/2 bf16 "
                         "(before it, B=2 won: 2.374/2.470/2.030 at B=1/2/4)")
    ap.add_argument("--fp32-precision", default="highest", choices=["highest", "high", "default"],
                    help="fp32 conv MXU pass count (nn/layers._precision_for); "
                         "only meaningful with --dtype float32")
    ap.add_argument("--act-quant", default="int8s", choices=["none", "int8", "int8s", "int8mxu"],
                    help="int8 activation storage on 5D volume conv_bn links "
                         "(nn/layers._maybe_quant_act; accuracy measured in "
                         "tools/int8_accuracy_probe.py). Default int8s: the r4 TPU "
                         "sweep's fastest accuracy-cleared mode (with --warp-quant "
                         "int8): 2.8921 vs 2.8361 bf16 maps/s; int8mxu measured "
                         "SLOWER (2.5714) — see ROUND4.md")
    ap.add_argument("--warp-quant", default="int8", choices=["none", "int8"],
                    help="int8 storage for the bilinear plane-sweep warped volumes "
                         "(geometry/warp._maybe_quant_warp; exact per-channel scale "
                         "bound from the 2D source map, independent of --act-quant)")
    args = ap.parse_args()
    xla_options = dict(kv.split("=", 1) for kv in args.xla_option)
    # keep the kernel's VMEM envelope in sync with a changed compiler limit
    # (ops/softargmin._vmem_budget sizes blocks off PipelineConfig.scoped_vmem_kib)
    vmem_kib = xla_options.get("xla_tpu_scoped_vmem_limit_kib")
    scoped_vmem_kib = int(vmem_kib) if vmem_kib is not None else None

    import jax

    from atvsnet_tpu.utils.runtime import setup_jax

    setup_jax()
    dev = jax.devices()[0]

    def run(view_num: int) -> float:
        return measure(
            dev, args.dtype, args.iters, xla_options=xla_options,
            pair_batch=args.pair_batch, view_num=view_num, batch=args.batch,
            act_quant=args.act_quant, warp_quant=args.warp_quant,
            fp32_precision=args.fp32_precision, scoped_vmem_kib=scoped_vmem_kib,
        )

    dm_per_s = run(args.view_num)
    dm8_per_s = None
    if not args.skip_8view and args.view_num != 8:
        try:
            dm8_per_s = run(8)
        except Exception as e:  # never let the secondary line sink the artifact
            print(f"# 8-view measurement failed: {e}", flush=True)

    baseline = None
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            baseline = json.load(f).get("cpu_dm_per_s")
    if baseline is None and args.with_cpu_baseline:
        try:
            jax.config.update("jax_platforms", "axon,cpu")
        except Exception:
            pass
        try:
            cpu = jax.devices("cpu")[0]
            baseline = measure(cpu, "float32", iters=1)
            with open(CACHE, "w") as f:
                json.dump({"cpu_dm_per_s": baseline, "workload": f"{VIEW_NUM}v {H}x{W} D{D}"}, f)
        except Exception as e:  # CPU backend unavailable under the TPU plugin
            print(f"# cpu baseline unavailable: {e}", flush=True)
    if baseline is None:
        baseline = CPU_ANCHOR_DM_PER_S

    record = {
        "metric": f"eth3d_{args.view_num}view_depth_maps_per_sec_per_chip",
        "value": round(dm_per_s, 4),
        "unit": f"depth maps/s ({args.view_num}-view, 480x896, D=128, "
                f"{args.dtype}, batch={args.batch})",
        "vs_baseline": round(dm_per_s / baseline, 2),
        "dtype": args.dtype,
        "act_quant": args.act_quant,
        "warp_quant": args.warp_quant,
    }
    if dm8_per_s is not None:
        # the reference eval driver's flagship config (view_num=8) in the SAME
        # artifact so it regression-tracks alongside the 5-view demo config
        record["eth3d_8view_depth_maps_per_sec_per_chip"] = round(dm8_per_s, 4)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
