"""Probe: can int8 activation storage halve the CRM trunk's HBM traffic on TPU?

The e2e forward sits at the HBM roofline (tools/roofline.py: 341.9 GB/forward,
~960 GB/s effective), so the only remaining single-chip lever is cutting bytes.
Every CRM/refinement conv is conv -> batch-stat BN -> ReLU, and per-sample BN is
scale-invariant: BN(c*y) == BN(y) for any c > 0 — so a per-tensor quantization
scale on the conv OUTPUT cancels exactly through the next BN, up to rounding and
clipping. That makes int8 activation storage between layers semantically clean
(no calibration needed for correctness of the BN math, only for clipping range).

This probe measures a CRM-shaped conv_bn chain (the stage-1/3 hot shape:
(1, 128, 120, 224, 8), 3x3x3 SAME, input-stacked routing) in three forms:

  bf16      — production path (tools/microbench_conv.py heuristics)
  int8store — activations live in HBM as int8; dequant fuses into the conv's
              tap-stack producer, conv runs bf16 on the MXU, BN+ReLU+requant
              (dynamic per-tensor max-abs scale) writes int8 back
  int8mxu   — same storage, but the 2D conv itself consumes int8 operands with
              preferred_element_type=int32 (v5e native int8 MXU path)

and reports s/layer, the XLA cost-model bytes for each compiled chain, and
whether the optimized HLO materializes full-size convert()s (which would mean
the int8 tensors get expanded to bf16 in HBM and the byte cut is fiction).

Usage: python tools/microbench_int8.py [--iters 12] [--layers 6] [--ci 8 --co 8]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--ci", type=int, default=8)
    ap.add_argument("--co", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--h", type=int, default=120)
    ap.add_argument("--w", type=int, default=224)
    args = ap.parse_args()

    from atvsnet_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from atvsnet_tpu.nn import layers as L
    from tools._bench import loop_time

    B, D, H, W, Ci, Co = 1, args.d, args.h, args.w, args.ci, args.co
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, D, H, W, Ci), jnp.float32)
    ws = [
        jax.random.normal(jax.random.PRNGKey(i + 1), (3, 3, 3, Ci if i == 0 else Co, Co),
                          jnp.float32) * 0.2
        for i in range(args.layers)
    ]

    elems = B * D * H * W
    # per layer: read x + write y + BN re-read y + re-read for norm pass + write out
    # (we report GB/s against the bf16 ideal so the three variants are comparable)
    gb_layer_bf16 = elems * (Ci + Co) * 2 / 1e9

    def tap_stack(x):
        zero = jnp.zeros_like(x[:, :1])
        xm = jnp.concatenate([zero, x[:, :-1]], axis=1)
        xp = jnp.concatenate([x[:, 1:], zero], axis=1)
        return jnp.concatenate([xm, x, xp], axis=-1)  # (B, D, H, W, 3Ci)

    def conv2d_from_stack(xs, w, pet=None):
        w2 = jnp.concatenate([w[0], w[1], w[2]], axis=-2)  # (3, 3, 3Ci, Co)
        Bs, Ds, Hs, Ws, K = xs.shape
        y = lax.conv_general_dilated(
            xs.reshape(Bs * Ds, Hs, Ws, K),
            w2.astype(xs.dtype if pet is None else w2.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        )
        return y.reshape(Bs, Ds, Hs, Ws, -1)

    # ---- variant: production bf16 ----
    def chain_bf16(x):
        y = x.astype(jnp.bfloat16)
        for w in ws:
            y = L.conv_bn({"w": w}, y)
        return y

    # ---- variant: int8 storage, bf16 MXU ----
    def bn_relu_quant(y_f32):
        axes = tuple(range(1, y_f32.ndim - 1))
        mean = jnp.mean(y_f32, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(y_f32), axis=axes, keepdims=True) - jnp.square(mean)
        z = jnp.maximum((y_f32 - mean) * lax.rsqrt(var + 1e-3), 0.0)
        s = jnp.max(jnp.abs(z)) / 127.0 + 1e-12
        q = jnp.clip(jnp.round(z / s), -127, 127).astype(jnp.int8)
        return q  # scale dropped: next BN is scale-invariant

    def chain_int8store(x):
        s0 = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
        q = jnp.clip(jnp.round(x / s0), -127, 127).astype(jnp.int8)
        for w in ws:
            xs = tap_stack(q).astype(jnp.bfloat16)  # dequant scale cancels in BN
            y = conv2d_from_stack(xs, w.astype(jnp.bfloat16)).astype(jnp.float32)
            q = bn_relu_quant(y)
        return q

    # ---- variant: int8 storage, STATIC 6-sigma scale (no max pass; relu -> uint8) ----
    def bn_relu_quant_static(y_f32):
        axes = tuple(range(1, y_f32.ndim - 1))
        mean = jnp.mean(y_f32, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(y_f32), axis=axes, keepdims=True) - jnp.square(mean)
        z = jnp.maximum((y_f32 - mean) * lax.rsqrt(var + 1e-3), 0.0)
        # BN output is unit-variance by construction: fixed [0, 6] range, 255 levels
        return jnp.clip(jnp.round(z * (255.0 / 6.0)), 0, 255).astype(jnp.uint8)

    def chain_int8static(x):
        q = jnp.clip(jnp.round(x * (255.0 / 6.0)), 0, 255).astype(jnp.uint8)
        for w in ws:
            xs = tap_stack(q).astype(jnp.bfloat16)  # scale cancels in BN
            y = conv2d_from_stack(xs, w.astype(jnp.bfloat16)).astype(jnp.float32)
            q = bn_relu_quant_static(y)
        return q

    # ---- variant: int8 storage AND int8 MXU ----
    def chain_int8mxu(x):
        s0 = jnp.max(jnp.abs(x)) / 127.0 + 1e-12
        q = jnp.clip(jnp.round(x / s0), -127, 127).astype(jnp.int8)
        for w in ws:
            wq_s = jnp.max(jnp.abs(w)) / 127.0 + 1e-12
            wq = jnp.clip(jnp.round(w / wq_s), -127, 127).astype(jnp.int8)
            xs = tap_stack(q)
            y = conv2d_from_stack(xs, wq, pet=jnp.int32).astype(jnp.float32)
            q = bn_relu_quant(y)
        return q

    variants = [
        ("bf16 (production conv_bn)", chain_bf16, x0.astype(jnp.bfloat16)),
        ("int8 storage / bf16 MXU", chain_int8store, x0),
        ("int8 static-scale / bf16 MXU", chain_int8static, jnp.abs(x0)),
        ("int8 storage / int8 MXU", chain_int8mxu, x0),
    ]

    for name, fn, xin in variants:
        try:
            lowered = jax.jit(fn).lower(xin)
            compiled = lowered.compile()
        except Exception as e:  # int8 conv may be unsupported on some toolchains
            print(f"{name:34s} COMPILE FAILED: {type(e).__name__}: {str(e)[:140]}")
            continue
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        byt = ca.get("bytes accessed", float("nan"))
        # full-size converts that survived fusion = the byte cut is not real
        txt = compiled.as_text()
        big_converts = 0
        for m in re.finditer(r"= (\S+) convert\(", txt):
            shape = m.group(1)
            dims = re.findall(r"\d+", shape.split("{")[0])
            n = int(np.prod([int(d) for d in dims])) if dims else 0
            if n >= elems:  # full-volume materialized convert
                big_converts += 1
        dt = loop_time(
            f"{name} x{args.layers}", fn, xin, iters=args.iters,
            gbytes=gb_layer_bf16 * args.layers,
            extra=f"cost={byt / 1e9:6.1f}GB  big_converts={big_converts}",
        )
        print(f"    -> {dt / args.layers * 1e3:.2f} ms/layer")


if __name__ == "__main__":
    main()
