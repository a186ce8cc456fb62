"""Compile-latency tracking per flagship bucket (VERDICT r4 item 3 / weak #3).

A fresh (shape, dtype, quant) bucket costs minutes of XLA compile on this platform
(utils/runtime.py); the persistent cache (~/.cache/atvsnet_tpu/xla, override with
ATVSNET_XLA_CACHE) makes repeats sub-second. Those two numbers were folklore —
this makes them a committed artifact: for each requested mode the inference
forward (bench.py's program) is traced + compiled in a SUBPROCESS whose
ATVSNET_XLA_CACHE points at a fresh temp dir (cold) and then re-run against the
same dir (warm cache hit), so in-memory jit caches cannot contaminate either
measurement.

Usage:
    python tools/bench_compile.py [--view_num 5] [--max_d 128] [--max_h 480]
        [--max_w 896] [--dtype bfloat16] [--act-quant int8s] [--warp-quant int8]
        [--compiler-option exec_time_optimization_effort=-1.0 ...] [--run-iters 3]

Prints one JSON line: {"cold_compile_s", "warm_cache_hit_s", "trace_lower_s", ...}.

--compiler-option (repeatable, key=value with value parsed as JSON when
possible) feeds XLA's per-compile knobs through `lowered.compile(
compiler_options=...)` — the reduction levers VERDICT r4 item 3 asked to try
on the 326 s flagship cold compile. The knobs this toolchain's remote-compile
helper accepts: `exec_time_optimization_effort` and `memory_fitting_effort`
(floats in [-1, 1], default 0; -1 = spend less compile time). --run-iters
additionally times the compiled program so a compile-time win that costs
runtime is visible in the same artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(args) -> None:
    """Measure trace+lower and compile of the flagship forward in THIS process."""
    from atvsnet_tpu.utils.runtime import setup_jax

    setup_jax()

    import jax
    import jax.numpy as jnp

    from atvsnet_tpu.config import PipelineConfig
    from atvsnet_tpu.data.synthetic import synthetic_scene
    from atvsnet_tpu.models.atvsnet import multi_view_forward
    from atvsnet_tpu.models.tvsnet import init_params

    cfg = PipelineConfig(
        view_num=args.view_num, max_d=args.max_d, max_h=args.max_h, max_w=args.max_w,
        compute_dtype=args.dtype, act_quant=args.act_quant, warp_quant=args.warp_quant,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    images, cams = synthetic_scene(
        view_num=args.view_num, H=args.max_h, W=args.max_w, D=args.max_d, seed=0
    )
    fwd = jax.jit(
        lambda p, i, c: jnp.sum(
            multi_view_forward(p, i, c, cfg)["depth_up"].astype(jnp.float32)
        )
    )
    opts = parse_compiler_options(args.compiler_option)
    imgs, cams = jnp.asarray(images), jnp.asarray(cams)
    t0 = time.perf_counter()
    lowered = fwd.lower(params, imgs, cams)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile(compiler_options=opts or None)
    t_compile = time.perf_counter() - t0
    rec = {"trace_lower_s": round(t_lower, 2), "compile_s": round(t_compile, 2)}
    if args.run_iters:
        import numpy as np

        # block_until_ready returns before execution on the axon platform; a
        # scalar device_get is the only reliable fence (see bench.py).
        np.asarray(compiled(params, imgs, cams))  # warmup dispatch
        t0 = time.perf_counter()
        for _ in range(args.run_iters):
            out = compiled(params, imgs, cams)
        np.asarray(out)
        rec["run_s_per_iter"] = round((time.perf_counter() - t0) / args.run_iters, 4)
    print(json.dumps(rec), flush=True)


def parse_compiler_options(pairs: list[str] | None) -> dict:
    opts = {}
    for kv in pairs or []:
        k, _, v = kv.partition("=")
        try:
            opts[k] = json.loads(v)
        except ValueError:
            opts[k] = v
    return opts


def run_child(argv_tail, cache_dir: str, timeout_s: int) -> dict:
    env = dict(os.environ)
    env["ATVSNET_XLA_CACHE"] = cache_dir
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"] + argv_tail,
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout_s,
    )
    if out.returncode != 0:
        raise RuntimeError(f"child failed rc={out.returncode}:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--view_num", type=int, default=5)
    ap.add_argument("--max_d", type=int, default=128)
    ap.add_argument("--max_h", type=int, default=480)
    ap.add_argument("--max_w", type=int, default=896)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--act-quant", default="int8s",
                    choices=["none", "int8", "int8s", "int8mxu"])
    ap.add_argument("--warp-quant", default="int8", choices=["none", "int8"])
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-child wall clock bound (cold flagship compiles have "
                         "been observed at 6-10+ min)")
    ap.add_argument("--compiler-option", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="repeatable; forwarded to lowered.compile(compiler_options=...)")
    ap.add_argument("--run-iters", type=int, default=0,
                    help="also time the compiled program (per-iter seconds)")
    args = ap.parse_args()

    if args.child:
        child(args)
        return

    tail = [
        "--view_num", str(args.view_num), "--max_d", str(args.max_d),
        "--max_h", str(args.max_h), "--max_w", str(args.max_w),
        "--dtype", args.dtype, "--act-quant", args.act_quant,
        "--warp-quant", args.warp_quant,
    ]
    for kv in args.compiler_option:
        tail += ["--compiler-option", kv]
    if args.run_iters:
        tail += ["--run-iters", str(args.run_iters)]
    with tempfile.TemporaryDirectory(prefix="atvsnet_xla_cold_") as fresh:
        cold = run_child(tail, fresh, args.timeout)
        warm = run_child(tail, fresh, args.timeout)
    rec = {
        "metric": "flagship_bucket_compile_seconds",
        "config": f"{args.view_num}v {args.max_h}x{args.max_w} D{args.max_d} "
                  f"{args.dtype} act={args.act_quant} warp={args.warp_quant}",
        "compiler_options": parse_compiler_options(args.compiler_option),
        "cold_compile_s": cold["compile_s"],
        "warm_cache_hit_s": warm["compile_s"],
        "trace_lower_s": cold["trace_lower_s"],
    }
    if args.run_iters:
        rec["run_s_per_iter"] = cold.get("run_s_per_iter")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
