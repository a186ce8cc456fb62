"""Rank layout copies in the compiled e2e forward by XLA's own cost estimates.

Compiles the bench workload (5-view 480x896 D=128, B=2 by default) and parses the
optimized HLO for standalone `copy` instructions (layout transposes that survived
fusion), reporting each with its backend-estimated cycles, the producing source
line, and whether it sits inside the pair-scan while body (executes once per pair
pass). This is how the round-3 warp corner-lerp fusion target was found; run it
after any layout-affecting change to see what the compiler is still moving around.

Usage: python tools/hlo_copy_audit.py [--batch 2] [--dtype bfloat16] [--top 20]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e TPU core clock (approx; used only to express relative cycle counts in ms)
CLOCK_HZ = 0.94e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--view-num", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    from atvsnet_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    import bench
    from atvsnet_tpu.config import PipelineConfig
    from atvsnet_tpu.models.atvsnet import multi_view_forward
    from atvsnet_tpu.models.tvsnet import init_params

    cfg = PipelineConfig(
        view_num=args.view_num, max_d=bench.D, max_h=bench.H, max_w=bench.W,
        compute_dtype=args.dtype,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    images, cams = bench._inputs(args.view_num)
    if args.batch > 1:
        import numpy as np

        images = np.concatenate([images] * args.batch, axis=0)
        cams = np.concatenate([cams] * args.batch, axis=0)

    fwd = jax.jit(
        lambda p, i, c: jnp.sum(
            multi_view_forward(p, jnp.asarray(i), jnp.asarray(c), cfg)["depth_up"].astype(jnp.float32)
        )
    )
    txt = fwd.lower(params, images, cams).compile().as_text()

    # while-body region bounds: copies inside execute once per pair pass
    body_spans = []
    for m in re.finditer(r"%region_\d+[^\n]*\{", txt):
        depth, i = 1, m.end()
        while depth and i < len(txt):
            depth += {"{": 1, "}": -1}.get(txt[i], 0)
            i += 1
        body_spans.append((m.start(), i))

    rows = []
    for m in re.finditer(
        r"%(copy[\w.\-]*) = (\S+) copy\([^)]*\)(.*)", txt
    ):
        name, shape, rest = m.groups()
        cyc = re.search(r'"estimated_cycles":"(\d+)"', rest)
        src = re.search(r'source_file="([^"]+)" source_line=(\d+)', rest)
        cycles = int(cyc.group(1)) if cyc else 0
        in_body = any(a <= m.start() < b for a, b in body_spans)
        rows.append(
            {
                "name": name,
                "shape": shape,
                "cycles": cycles,
                "src": f"{os.path.basename(src.group(1))}:{src.group(2)}" if src else "?",
                "while": in_body,
            }
        )

    n_pairs = args.view_num - 1
    for r in rows:
        r["total_cycles"] = r["cycles"] * (n_pairs if r["while"] else 1)
    rows.sort(key=lambda r: -r["total_cycles"])
    grand = sum(r["total_cycles"] for r in rows)
    print(f"{len(rows)} standalone copies; estimated total "
          f"{grand / CLOCK_HZ * 1e3:.1f} ms/forward (batch={args.batch})")
    for r in rows[: args.top]:
        ms = r["total_cycles"] / CLOCK_HZ * 1e3
        mult = f"x{n_pairs} (pair scan)" if r["while"] else ""
        print(f"  {ms:6.2f} ms  {r['src']:28s} {r['shape'][:58]:58s} {mult}")


if __name__ == "__main__":
    main()
