"""Accuracy kill-test for int8 activation storage, runnable on CPU.

Companion to tools/microbench_int8.py (the perf side). Before investing in a
production int8 activation path, measure what per-tensor dynamic int8 storage
between conv_bn links does to the pipeline's DEPTH outputs. Monkey-patches
`nn.layers.conv_bn` / `deconv_bn` with variants that round-trip their output
through int8 (dynamic per-tensor max-abs scale — the cheapest scheme that can
work, carrying the scale so downstream convs see correctly scaled values), runs
`multi_view_forward` both ways on a synthetic scene, and reports depth deltas.

If the relative depth error at the quantized links is already large at a small
config, the idea dies here without TPU time; if small, the TPU perf probe
decides.

Measured (5-view 64x64 D=16 fp32, synthetic scene, random-init params, CPU):
  --scope all                 depth mean|d|=0.0059 sweep units, 58.6% pixels moved >1% of range
  --scope volumes --mode int8  depth mean|d|=0.0022, 19.9% moved >1% of range
  --scope volumes --mode int8s depth mean|d|=0.0020, 19.5% moved >1% of range
                               (0.0017 / 14.5% once the conv3d_mixed links are included)
  --scope volumes --mode int8w depth mean|d|=0.0021, 22.3% moved >1% of range
  yardstick: bf16-vs-fp32 same config = mean|d|=0.0037, 43.0% moved >1% of range
i.e. int8 storage on the 5D volume links perturbs depth LESS than the default
bf16 compute mode itself does vs fp32 — the accuracy gate passes for a
volumes-scoped int8 mode, and the STATIC 6-sigma lattice (int8s, uint8 with a
2x-finer step on relu links, no data-dependent scale pass) is the most accurate
of the three; whether to ship it is purely a perf question
(tools/microbench_int8.py + bench.py --act-quant on TPU).

Usage (CPU, wedge-safe):
  env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE JAX_PLATFORMS=cpu \
    python tools/int8_accuracy_probe.py [--h 64 --w 64 --d 16 --views 5]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--w", type=int, default=64)
    ap.add_argument("--d", type=int, default=16)
    ap.add_argument("--views", type=int, default=5)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument(
        "--scope", default="all", choices=["all", "volumes"],
        help="volumes: quantize only 5D (plane-sweep volume) conv_bn outputs — "
        "the links that carry the HBM byte budget",
    )
    ap.add_argument(
        "--mode", default="int8", choices=["none", "int8", "int8s", "int8w", "int8mxu"],
        help="volumes scope only: which production PipelineConfig.act_quant mode to "
        "measure (int8 = dynamic per-tensor scale, int8s = static 6-sigma "
        "lattice, uint8 on relu links — see nn/layers._maybe_quant_act). "
        "int8w = int8s activations PLUS per-tensor symmetric int8 conv/deconv "
        "WEIGHTS on the 5D links (probe-only fake-quant): the accuracy gate "
        "for a future int8-MXU conv path (weights and activations both int8, "
        "int32 accumulation; BN's scale invariance absorbs both scales). "
        "int8mxu = the PRODUCTION int8-MXU path (conv(qin=True) call sites run "
        "real int8 convs with int32 accumulation, signed 127-level input "
        "lattice — strictly what bench.py --act-quant int8mxu executes). "
        "none = no activation quant (for --warp-quant-only runs)",
    )
    ap.add_argument(
        "--warp-quant", default=None, choices=["int8"],
        help="volumes scope: ALSO store the bilinear plane-sweep warped volumes "
        "int8 (geometry/warp._maybe_quant_warp, per-channel exact-bound scale); "
        "composes with --mode or measures alone with --mode none",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from atvsnet_tpu.config import PipelineConfig
    from atvsnet_tpu.models.atvsnet import multi_view_forward
    from atvsnet_tpu.models.tvsnet import init_params
    from atvsnet_tpu.nn import layers as L
    from atvsnet_tpu.data.synthetic import synthetic_scene

    cfg = PipelineConfig(
        view_num=args.views,
        max_d=args.d,
        max_h=args.h,
        max_w=args.w,
        compute_dtype=args.dtype,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    images, cams = synthetic_scene(
        view_num=args.views, H=args.h, W=args.w, D=args.d, seed=0
    )

    def run(run_cfg=cfg):
        out = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, run_cfg))(
            params, images, cams
        )
        return {k: np.asarray(out[k], np.float64) for k in ("depth", "depth_up")}

    base = run()

    # ---- quantizing wrappers: round-trip conv_bn/deconv_bn OUTPUT through int8 ----
    orig_conv_bn, orig_deconv_bn = L.conv_bn, L.deconv_bn

    def _q(y):
        if args.scope == "volumes" and y.ndim != 5:
            return y
        # per-tensor dynamic max-abs; ReLU outputs are >=0 but keep the signed
        # form so relu=False call sites (pre-residual-add links) are covered too
        s = jnp.max(jnp.abs(y.astype(jnp.float32))) / 127.0 + 1e-12
        q = jnp.clip(jnp.round(y.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
        return (q.astype(jnp.float32) * s).astype(y.dtype)

    def conv_bn_q(params, x, **kw):
        return _q(orig_conv_bn(params, x, **kw))

    def deconv_bn_q(params, x, **kw):
        return _q(orig_deconv_bn(params, x, **kw))

    if args.scope == "volumes" and args.mode == "int8w":
        # int8s activations via the production knob + probe-only symmetric int8
        # WEIGHT fake-quant on the 5D conv/deconv links
        def _qw(w):
            s = jnp.max(jnp.abs(w)) / 127.0 + 1e-12
            return (jnp.clip(jnp.round(w / s), -127, 127) * s).astype(w.dtype)

        def conv_bn_w(params, x, **kw):
            p = dict(params, w=_qw(params["w"])) if x.ndim == 5 else params
            return orig_conv_bn(p, x, **kw)

        def deconv_bn_w(params, x, **kw):
            p = dict(params, w=_qw(params["w"])) if x.ndim == 5 else params
            return orig_deconv_bn(p, x, **kw)

        L.conv_bn, L.deconv_bn = conv_bn_w, deconv_bn_w
        try:
            quant = run(cfg.replace(act_quant="int8s"))
        finally:
            L.conv_bn, L.deconv_bn = orig_conv_bn, orig_deconv_bn
    elif args.scope == "volumes":
        # measure the PRODUCTION path (nn/layers._maybe_quant_act) exactly as
        # bench.py --act-quant runs it, including int8s's uint8 relu links;
        # --warp-quant composes (or measures alone with --mode none)
        quant = run(cfg.replace(
            act_quant=args.mode if args.mode != "none" else "none",
            warp_quant=args.warp_quant or "none",
        ))
    else:
        L.conv_bn, L.deconv_bn = conv_bn_q, deconv_bn_q
        # crm/refine/aam bind `L` at module level and call L.conv_bn dynamically,
        # so patching the module attribute reaches every call site
        try:
            quant = run()
        finally:
            L.conv_bn, L.deconv_bn = orig_conv_bn, orig_deconv_bn

    for k in ("depth", "depth_up"):
        a, b = base[k], quant[k]
        ad = np.abs(a - b)
        denom = np.maximum(np.abs(a), 1e-6)
        print(
            f"{k:10s} max|d|={ad.max():.5f}  mean|d|={ad.mean():.6f}  "
            f"rel-mean={(ad / denom).mean():.5f}  "
            f"(baseline range [{a.min():.3f}, {a.max():.3f}])"
        )
    # fraction of pixels whose depth moved by more than 1% of the sweep range
    for k in ("depth", "depth_up"):
        ad = np.abs(base[k] - quant[k])
        rng = base[k].max() - base[k].min() + 1e-9
        frac = (ad > 0.01 * rng).mean()
        print(f"{k:10s} pixels moved >1% of depth range: {frac * 100:.3f}%")


if __name__ == "__main__":
    main()
