"""Functional NN primitives with the reference's exact TF-1.5 semantics.

Parameters are plain nested dicts of jnp arrays keyed by the reference's variable-scope
names (cnn_wrapper/network.py), so a TF-checkpoint -> pytree import is a direct rename.

Semantics preserved from the reference:
  * conv / conv3d: SAME padding, no bias unless `b` given (network.py:141-169).
  * conv_bn (network.py:172-215): conv -> batch_normalization(center=False, scale=False,
    training=True) -> relu. The reference builds every graph with is_training=True
    (e.g. model.py:349), so BN ALWAYS normalizes by batch statistics and carries no
    usable parameters — it is a parameter-free normalization over (batch, spatial).
  * deconv_bn (network.py:510-550): conv{2,3}d_transpose, SAME, stride 2 -> same BN.
    Implemented as the exact vector-Jacobian product of the strided SAME conv, which is
    the definition of tf.nn.conv*d_transpose (zero extra runtime cost after XLA).
  * bottleneck (network.py:552-602): slim pre-activation residual unit; slim defaults
    mean preact BN has a beta (center=True, scale=False), the three convs carry biases
    and conv1/conv2 have ReLU; stride>1 uses explicit "fixed" padding + VALID
    (network.py:589-595), which differs from SAME on even sizes.

Layout: channel-last (NHWC / NDHWC) — TPU native. Weights stored fp32 in TF layout
(spatial..., in, out); compute dtype follows the activation dtype with float32 inputs
pinned to full-precision MXU passes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from atvsnet_tpu import numerics

_DIM_NUMBERS = {2: ("NHWC", "HWIO", "NHWC"), 3: ("NDHWC", "DHWIO", "NDHWC")}


_FP32_PRECISION = {
    "highest": lax.Precision.HIGHEST,  # 6-pass bf16 expansion: full fp32 accuracy
    "high": lax.Precision.HIGH,        # 3-pass: ~tf32-grade accuracy, ~2x faster MXU
    "default": lax.Precision.DEFAULT,  # 1-pass bf16 inputs (fp32 accumulate)
}


def _precision_for(x: jnp.ndarray):
    # fp32 activations -> full-precision MXU passes by default; bf16 rides the fast
    # path. PipelineConfig.fp32_precision=high|default selects a cheaper fp32 conv
    # pass (VERDICT r2 item 10 middle path), delivered via the trace-scoped
    # numerics policy the model entry points install (atvsnet_tpu/numerics.py) —
    # the enclosing jit keys on the config, so distinct settings cache distinctly.
    if x.dtype == jnp.float32:
        return _FP32_PRECISION[numerics.current().fp32_precision]
    return lax.Precision.DEFAULT


def _conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int, rate: int = 1, padding="SAME") -> jnp.ndarray:
    # integer operands (the int8mxu activation-quant path) accumulate in int32 on
    # the MXU's native int8 path; float operands keep their usual precision rules
    integer = jnp.issubdtype(x.dtype, jnp.integer)
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype) if not integer else w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(rate, rate),
        dimension_numbers=_DIM_NUMBERS[2],
        precision=None if integer else _precision_for(x),
        preferred_element_type=jnp.int32 if integer else None,
    )


def _conv3d_decomposed(x: jnp.ndarray, w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """3D SAME conv as depth-tap-decomposed 2D convs (exact).

    XLA's TPU conv3d lowering runs 2.5-3.7x slower than the equivalent 2D convs at
    this model's channel widths (measured: 6.4 vs 23.9 TF/s at stride 1; 1.5 TF/s at
    stride 2 — tools/microbench_conv.py), so every NDHWC conv folds D into the conv2d
    batch and sums the 3 depth taps with shifted adds. Depth kernel size must be 3,
    which is all the model uses (reference cnn_wrapper/atvsnet.py).
    """
    B, D, h, wd, Ci = x.shape
    kd = w.shape[0]
    assert kd == 3, "depth kernel must be 3"
    Co = w.shape[-1]

    if stride == 1:
        x2 = x.reshape(B * D, h, wd, Ci)
        # one conv with the three depth taps stacked on the OUTPUT axis: a single
        # input read and a 3x wider (more MXU-efficient) matmul
        w_cat = jnp.concatenate([w[0], w[1], w[2]], axis=-1)     # (3, 3, Ci, 3*Co)
        y = _conv2d(x2, w_cat, 1).reshape(B, D, h, wd, 3 * Co)
        y0, y1, y2 = y[..., :Co], y[..., Co : 2 * Co], y[..., 2 * Co :]
        # SAME pad (1,1) over D: out[d] = y0[d-1] + y1[d] + y2[d+1]
        zero = jnp.zeros_like(y1[:, :1])
        return (
            jnp.concatenate([zero, y0[:, :-1]], axis=1)
            + y1
            + jnp.concatenate([y2[:, 1:], zero], axis=1)
        )

    assert stride == 2 and D % 2 == 0
    # SAME pad (0,1) over D: out[od] = sum_kd x[2*od + kd] (tap at index D is zero).
    # tap-stack reads x ONCE and does the depth combination on the 8x-smaller
    # strided output (~0.3GB vs pair-fold's ~0.9GB on the 32->16 full-res conv);
    # deconv() picks its own forward form because the VJP cost crossover differs.
    return _conv3d_s2_tapstack(x, w)


def _conv3d_s2_tapstack(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 depth conv with the 3 depth taps stacked on the OUTPUT axis.

    One conv2d over ALL D input slices (single read of x) producing (ho, wo, 3*Co)
    per slice; the depth combination then runs on the downsampled output:

        out[od] = z[2od, :Co] + z[2od+1, Co:2Co] + z[2od+2, 2Co:3Co]

    (the 2od+2 == D tap is the SAME zero pad). Computes 1.5x the strictly needed
    tap products (evens never use tap 1, odds never use taps 0/2) — FLOPs are not
    the bottleneck; HBM traffic is ~3x lower than the pair-fold form."""
    B, D, h, wd, Ci = x.shape
    Co = w.shape[-1]
    Do = D // 2
    ho, wo = -(-h // 2), -(-wd // 2)
    w_cat = jnp.concatenate([w[0], w[1], w[2]], axis=-1)   # (3, 3, Ci, 3Co)
    z = _conv2d(x.reshape(B * D, h, wd, Ci), w_cat, 2).reshape(B, Do, 2, ho, wo, 3 * Co)
    z_even = z[:, :, 0]
    z_odd = z[:, :, 1]
    y = z_even[..., :Co] + z_odd[..., Co : 2 * Co]
    if Do == 1:
        return y  # no output has a 2od+2 < D tap
    tap2 = z_even[:, 1:, :, :, 2 * Co :]                   # z[2od+2] for od < Do-1
    pad = jnp.zeros_like(z_even[:, :1, :, :, 2 * Co :])
    return y + jnp.concatenate([tap2, pad], axis=1)


def _conv3d_s2_pairfold(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 depth conv with the depth pair folded into channels: ONE tiled
    transpose + a single K=9*3Ci conv2d (no strided D-slices)."""
    B, D, h, wd, Ci = x.shape
    Co = w.shape[-1]
    Do = D // 2
    ho, wo = -(-h // 2), -(-wd // 2)
    xr = x.reshape(B, Do, 2, h, wd, Ci)
    xp = jnp.moveaxis(xr, 2, 4).reshape(B, Do, h, wd, 2 * Ci)
    xn = jnp.concatenate(
        [xp[:, 1:, :, :, :Ci], jnp.zeros_like(xp[:, :1, :, :, :Ci])], axis=1
    )
    xs = jnp.concatenate([xp, xn], axis=-1)                # (B, Do, h, w, 3Ci)
    w_cat = jnp.concatenate([w[0], w[1], w[2]], axis=-2)   # (3, 3, 3Ci, Co)
    y = _conv2d(xs.reshape(B * Do, h, wd, 3 * Ci), w_cat, 2)
    return y.reshape(B, Do, ho, wo, Co)


def _conv3d_s2_strided(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 depth conv via three strided D-slices (faster at narrow Ci)."""
    B, D, h, wd, Ci = x.shape
    Co = w.shape[-1]
    Do = D // 2
    ho, wo = -(-h // 2), -(-wd // 2)
    x_even = x[:, 0::2].reshape(B * Do, h, wd, Ci)
    x_odd = x[:, 1::2].reshape(B * Do, h, wd, Ci)
    x_next = jnp.concatenate([x[:, 2::2], jnp.zeros_like(x[:, :1])], axis=1)
    x_next = x_next.reshape(B * Do, h, wd, Ci)
    y = (
        _conv2d(x_even, w[0], 2)
        + _conv2d(x_odd, w[1], 2)
        + _conv2d(x_next, w[2], 2)
    )
    return y.reshape(B, Do, ho, wo, Co)


def _conv3d_input_stacked(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3D SAME stride-1 conv as ONE 2D conv over depth-shift-stacked channels (exact).

    Stacks the three depth taps on the INPUT channel axis (K = 9*3*Ci) instead of the
    output axis: measured faster than _conv3d_decomposed at full cost-volume
    resolution with Ci <= 16 (the MXU contraction is 3x deeper; at larger Ci or
    smaller spatial extents the decomposed form wins — see conv())."""
    B, D, h, wd, Ci = x.shape
    Co = w.shape[-1]
    zero = jnp.zeros_like(x[:, :1])
    xm = jnp.concatenate([zero, x[:, :-1]], axis=1)
    xp = jnp.concatenate([x[:, 1:], zero], axis=1)
    xs = jnp.concatenate([xm, x, xp], axis=-1)                    # (B, D, h, w, 3Ci)
    w2 = jnp.concatenate([w[0], w[1], w[2]], axis=-2)             # (3, 3, 3Ci, Co)
    return _conv2d(xs.reshape(B * D, h, wd, 3 * Ci), w2, 1).reshape(B, D, h, wd, Co)


def _quant_conv_operands(x: jnp.ndarray, w: jnp.ndarray):
    """int8mxu operand quantization for a volume conv whose input is on (or near)
    the static activation lattice (see _maybe_quant_act).

    Activations: signed int8 on the same +-R range as the stored links (values on
    the uint8 relu lattice land within half an int8 step). Weights: per-tensor
    symmetric max-abs int8 (exact scale, computed from the small kernel). Returns
    (x_int8, w_int8, output_scale): conv(x_int8, w_int8) accumulates in int32 and
    output_scale restores the float magnitude, so non-BN consumers (prob heads,
    residual adds, the conv3d_mixed 2D half) stay numerically correct."""
    r = numerics.current().act_quant_range
    si = r / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / si), -127.0, 127.0).astype(jnp.int8)
    wf = w.astype(jnp.float32)
    sw = jnp.max(jnp.abs(wf)) / 127.0 + 1e-12
    wq = jnp.clip(jnp.round(wf / sw), -127.0, 127.0).astype(jnp.int8)
    return xq, wq, si * sw


def conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 1,
    rate: int = 1,
    relu: bool = False,
    padding="SAME",
    qin: bool = False,
) -> jnp.ndarray:
    """Rank-dispatching SAME conv (2D on NHWC / 3D on NDHWC), TF-layout kernel.

    qin ("quantized input ok"): the CALLER asserts this conv's input is a stored
    activation-lattice link (or a small sum/concat/convex mix of such — see the
    crm/refine/aam call sites). Under PipelineConfig.act_quant=int8mxu such convs run
    with int8 operands on the MXU's native int8 path: the input re-quantize fuses
    into the link's int8 producer chain so the conv READS 1-byte operands (the
    tap-stack materializes at 1 byte/elem too) instead of dequantized bf16.
    Ignored in every other mode. INFERENCE-ONLY like the storage modes (round()
    has zero gradient)."""
    nd = x.ndim - 2
    if nd == 3 and rate == 1 and padding == "SAME" and w.shape[0] == 3 and stride in (1, 2):
        out_dtype = x.dtype
        s_out = None
        if qin and b is None and _act_quant_mode() == "int8mxu":
            x, w, s_out = _quant_conv_operands(x, w)
        # measured v5e heuristic (tools/microbench_conv.py / round-2 sweeps): the
        # input-stacked form wins at full cost-volume resolution with narrow inputs
        if stride == 1 and x.shape[-1] <= 16 and x.shape[2] * x.shape[3] >= 24000:
            y = _conv3d_input_stacked(x, w)
        else:
            y = _conv3d_decomposed(x, w, stride)
        if s_out is not None:
            y = (y.astype(jnp.float32) * s_out).astype(out_dtype)
    else:
        y = lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(stride,) * nd,
            padding=padding,
            rhs_dilation=(rate,) * nd,
            dimension_numbers=_DIM_NUMBERS[nd],
            precision=_precision_for(x),
        )
    if b is not None:
        y = y + b.astype(y.dtype)
    return jnp.maximum(y, 0) if relu else y


def fixed_pad_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: int = 2,
    rate: int = 1,
    relu: bool = False,
) -> jnp.ndarray:
    """Explicit-padding strided conv (resnet 'fixed padding', network.py:589-595)."""
    nd = x.ndim - 2
    k = w.shape[0]
    k_eff = k + (k - 1) * (rate - 1)
    pad_total = k_eff - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,) * nd,
        padding=[(pad_beg, pad_end)] * nd,
        rhs_dilation=(rate,) * nd,
        dimension_numbers=_DIM_NUMBERS[nd],
        precision=_precision_for(x),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return jnp.maximum(y, 0) if relu else y


def batch_stat_norm(
    x: jnp.ndarray,
    eps: float = 1e-3,
    beta: Optional[jnp.ndarray] = None,
    groups: int = 1,
) -> jnp.ndarray:
    """Normalize by PER-SAMPLE statistics over the spatial axes (training-mode BN
    at batch_size=1, which is the only regime the reference ever runs).

    tf.layers.batch_normalization(training=True) with center=scale=False computes
    biased moments over (batch, spatial) per channel, eps 1e-3; every reference
    driver feeds batch_size=1 (example.py:25-48), so those moments are per-sample.
    Statistics here reduce over axes 1..ndim-2 (spatial only, per batch element,
    per channel) — identical to the reference at B=1, and it makes the batch axis
    a PURE throughput axis: stacking distinct ref images (eval --batch N, SPMD
    'data' sharding) reproduces the B=1 outputs bit-for-bit instead of coupling
    samples through shared statistics. Statistics always accumulate in fp32.

    groups is accepted for API compatibility and ignored: per-sample statistics
    subsume per-tower grouping (each stacked tower element IS a leading-axis
    element, so it already gets its own statistics).
    """
    del groups
    orig_shape = x.shape
    axes = tuple(range(1, x.ndim - 1))
    if x.dtype == jnp.float32:
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x), axis=axes, keepdims=True) - jnp.square(mean)
        y = (x - mean) * lax.rsqrt(var + eps)
    else:
        # low-precision activations: accumulate statistics in fp32 WITHOUT
        # materializing an fp32 copy of the volume (the pipeline is HBM-bound —
        # 226GB traffic/forward measured). Both moments come from ONE fused
        # reduction pass over x (multi-output fusion); the var = E[x^2] - mean^2
        # form (used by the fp32 branch above as well) loses nothing observable
        # here: activations are post-conv/post-norm with |mean| ~ std, far from
        # the fp32 cancellation regime, and eps=1e-3 dominates any residual
        # negative-variance cancellation.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        m2 = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
        var = m2 - jnp.square(mean)
        y = (x - mean.astype(x.dtype)) * lax.rsqrt(var + eps).astype(x.dtype)
    if beta is not None:
        y = y + beta.astype(y.dtype)
    return y.astype(x.dtype).reshape(orig_shape)


def _act_quant_mode() -> str:
    """PipelineConfig.act_quant via the trace-scoped numerics policy (validated
    at policy construction, atvsnet_tpu/numerics.py)."""
    return numerics.current().act_quant


def _maybe_quant_act(y: jnp.ndarray, nonneg: bool = False) -> jnp.ndarray:
    """Optional int8 activation storage for 5D (plane-sweep volume) conv_bn links.

    PipelineConfig.act_quant (trace-scoped via atvsnet_tpu/numerics.py — part of
    the jit cache key) round-trips every volume
    conv_bn/deconv_bn output through an int8 lattice. The int8 tensor is the only
    fusion root XLA has to keep in HBM; the dequantize (convert * scale) is a
    cheap elementwise chain that duplicates into each consumer fusion, so volume
    links are STORED at 1 byte/elem instead of 2 (the pipeline is
    HBM-bandwidth-bound end to end — tools/roofline.py).

      int8   dynamic per-tensor max-abs scale. Exact-range, but the scalar max
             is a reduction over the finished BN output, which costs one extra
             full read pass of the volume before the quantize pass can run —
             roughly byte-neutral vs bf16 storage; kept for accuracy reference.
      int8s  STATIC scale. batch_stat_norm output is unit-variance per channel
             by construction (no learned gamma), so a fixed clip range R sigma
             (PipelineConfig.act_quant_range, default 6.0) needs no data pass: the
             quantize fuses into the BN normalize pass and the link is written
             once at 1 byte/elem. relu links store uint8 over [0, R] (255
             levels); signed links store int8 over [-R, R].
      int8mxu  int8s storage PLUS int8 conv execution: volume convs whose
             caller marks the input as lattice-borne (conv(..., qin=True))
             consume int8 activations and per-tensor-symmetric int8 weights on
             the MXU's native int8 path with int32 accumulation (the output
             scale restores float magnitudes; BN would absorb it anyway). The
             conv then READS 1-byte operands instead of dequantized bf16 —
             the byte cut int8s alone cannot give, since XLA convs cannot
             fuse a dequantize into their operand reads.

    Accuracy: measured in tools/int8_accuracy_probe.py — volumes-scoped int8
    perturbs depth LESS than the default bf16 compute mode does vs fp32
    (mean |ddepth| 0.0022 vs 0.0037 sweep units at the probe config). Off by
    default; the e2e perf verdict lives in the README dead-end/win ledger.

    INFERENCE-ONLY: round() has zero gradient, so this knob would silently
    zero every volume-link gradient under jax.grad. cli/train.py never reads
    it; do not set it for training runs.
    """
    mode = _act_quant_mode()
    if y.ndim != 5 or mode == "none":
        return y
    yf = y.astype(jnp.float32)
    if mode == "int8":
        s = jnp.max(jnp.abs(yf)) / 127.0 + 1e-12
        q = jnp.clip(jnp.round(yf / s), -127.0, 127.0).astype(jnp.int8)
        return (q.astype(jnp.float32) * s).astype(y.dtype)
    r = numerics.current().act_quant_range
    if nonneg:
        s = r / 255.0
        q = jnp.clip(jnp.round(yf / s), 0.0, 255.0).astype(jnp.uint8)
    else:
        s = r / 127.0
        q = jnp.clip(jnp.round(yf / s), -127.0, 127.0).astype(jnp.int8)
    return (q.astype(jnp.float32) * s).astype(y.dtype)


def conv_bn(
    params: dict,
    x: jnp.ndarray,
    stride: int = 1,
    rate: int = 1,
    relu: bool = True,
    eps: float = 1e-3,
    groups: int = 1,
    qin: bool = False,
) -> jnp.ndarray:
    y = conv(x, params["w"], stride=stride, rate=rate, qin=qin)
    y = batch_stat_norm(y, eps=eps, groups=groups)
    return _maybe_quant_act(jnp.maximum(y, 0) if relu else y, nonneg=relu)


def _deconv3d_s2_shuffle(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 SAME conv3d_transpose (k=3) as a 2-tap conv + parity interleave.

    XLA lowers the transposed conv (input-dilated conv) at ~30 GB/s effective on v5e
    (measured, tools/microbench_hotops.py); this exact reformulation computes each
    output parity class p in {0,1}^3 directly:

        y[2j + p] = sum_{a in {0,1}^3} w[2a + p] * x[j - a]     (k = 2a+p <= 2)

    which is ONE 2x2(x2-tap-depth) conv to 8*Co channels on the SMALL input followed
    by a parity un-shuffle — no dilated zeros, no strided scatters. Derivation: the
    stride-2 SAME forward conv on even-length inputs has pad=(0,1), so x_hat[m] =
    sum_k w[k] y[2m+k]; transposing gives o = 2m+k, i.e. k = 2(j-m) + p for output
    o = 2j+p. Exact to reordering of the <=8-term sums (the VJP formulation computes
    the same sums via scatter).

    w: TF transpose-kernel layout (3, 3, 3, Co, Ci); x: (B, D, h, wd, Ci).
    Returns (B, 2D, 2h, 2wd, Co).
    """
    B, D, h, wd, Ci = x.shape
    Co = w.shape[-2]
    dt = x.dtype

    # Build the 2x2x2-tap kernel: K[t_d, t_h, t_w, ci, p_idx*Co + co]
    #   tap t (1 = x[j], 0 = x[j-1]) and parity p map to k = 2*(1-t) + p per axis;
    #   k = 3 (t=0, p=1) is out of kernel range -> zero.
    K = jnp.zeros((2, 2, 2, Ci, 8 * Co), jnp.float32)
    w_f = jnp.moveaxis(w.astype(jnp.float32), -2, -1)  # (3,3,3, Ci, Co) -> ci-major
    for td in (0, 1):
        kd = 2 * (1 - td)
        for th in (0, 1):
            kh = 2 * (1 - th)
            for tw in (0, 1):
                kw = 2 * (1 - tw)
                for pd in (0, 1):
                    for ph in (0, 1):
                        for pw in (0, 1):
                            kkd, kkh, kkw = kd + pd, kh + ph, kw + pw
                            if kkd > 2 or kkh > 2 or kkw > 2:
                                continue
                            p_idx = (pd * 4 + ph * 2 + pw) * Co
                            K = K.at[td, th, tw, :, p_idx : p_idx + Co].set(
                                w_f[kkd, kkh, kkw]
                            )

    # depth-tap decomposition of the 2x2x2 conv: two 2D convs on x[j] and x[j-1]
    K = K.astype(dt)
    zero = jnp.zeros_like(x[:, :1])
    x_prev = jnp.concatenate([zero, x[:, :-1]], axis=1)  # x[j-1] along D

    def conv2_valid_pad10(inp, k2):
        # 2x2 kernel over h/w with (1,0) front padding: taps x[j-1], x[j]
        return lax.conv_general_dilated(
            inp.reshape(B * D, h, wd, Ci),
            k2,
            window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
            dimension_numbers=_DIM_NUMBERS[2],
            precision=_precision_for(inp),
        ).reshape(B, D, h, wd, 8 * Co)

    y8 = conv2_valid_pad10(x, K[1]) + conv2_valid_pad10(x_prev, K[0])

    # parity un-shuffle: (B, D, h, wd, 2,2,2,Co) -> (B, 2D, 2h, 2wd, Co)
    y8 = y8.reshape(B, D, h, wd, 2, 2, 2, Co)
    y8 = jnp.transpose(y8, (0, 1, 4, 2, 5, 3, 6, 7))
    return y8.reshape(B, 2 * D, 2 * h, 2 * wd, Co)


def deconv(x: jnp.ndarray, w: jnp.ndarray, stride: int = 2, relu: bool = False) -> jnp.ndarray:
    """TF conv{2,3}d_transpose, SAME padding: exact VJP of the strided SAME conv.

    `w` uses the TF transpose-kernel layout (spatial..., out_ch, in_ch); as the forward
    kernel of the conv being transposed this is plain (spatial..., I=out_ch, O=in_ch).
    """
    out_ch = w.shape[-2]
    out_shape = (x.shape[0], *(s * stride for s in x.shape[1:-1]), out_ch)

    # routing the forward conv through conv() makes the 3D case inherit the
    # depth-decomposed 2D lowering; its linear transpose is equally decomposed.
    # For 3D stride-2 the tap-stacked forward's transpose won end-to-end over the
    # pair-fold/strided routes (2.362 -> 2.386 maps/s cached): the tap scatter
    # lands on the 8x-smaller z.
    # NOT routed here: the parity-shuffle form (_deconv3d_s2_shuffle) microbenches
    # 14% faster in isolation for the narrow Co=8 class but regresses the full
    # pipeline (its interleaved output layout forces copies at the consumers) —
    # kept as a measured negative, tools/microbench_deconv.py.
    if x.ndim == 5 and stride == 2 and w.shape[0] == 3:

        def fwd(y):
            return _conv3d_s2_tapstack(y, w)

    else:

        def fwd(y):
            return conv(y, w, stride=stride)

    y = jax.vjp(fwd, jnp.zeros(out_shape, x.dtype))[1](x)[0]
    return jnp.maximum(y, 0) if relu else y


def deconv_bn(
    params: dict,
    x: jnp.ndarray,
    stride: int = 2,
    relu: bool = True,
    eps: float = 1e-3,
    groups: int = 1,
) -> jnp.ndarray:
    y = deconv(x, params["w"], stride=stride)
    y = batch_stat_norm(y, eps=eps, groups=groups)
    return _maybe_quant_act(jnp.maximum(y, 0) if relu else y, nonneg=relu)


def avg_pool_same(x: jnp.ndarray, pool: int, stride: int) -> jnp.ndarray:
    """SAME average pooling that EXCLUDES padding from the mean (TF semantics)."""
    nd = x.ndim - 2
    if stride == pool:
        # non-overlapping (the SPP branches): reduce_window walks pool^2 adds per
        # output (27GB/s measured at 64x64); a zero-pad + reshape-sum streams the
        # input once, and the per-window valid counts are trace-time constants
        spatial = x.shape[1:-1]
        pads, counts_1d = [], []
        for H in spatial:
            out = -(-H // pool)
            tot = out * pool - H
            lo = tot // 2
            pads.append((lo, tot - lo))
            ones = np.zeros(out * pool, np.float32)
            ones[lo : lo + H] = 1.0
            counts_1d.append(ones.reshape(out, pool).sum(1))
        y = jnp.pad(x.astype(jnp.float32), ((0, 0),) + tuple(pads) + ((0, 0),))
        for axis in range(1, 1 + nd):
            s = y.shape
            y = y.reshape(s[:axis] + (s[axis] // pool, pool) + s[axis + 1 :]).sum(axis + 1)
        counts = counts_1d[0]
        for c in counts_1d[1:]:
            counts = counts[..., None] * c
        counts = jnp.asarray(counts.reshape(counts.shape + (1,)))
        return (y / counts).astype(x.dtype)
    window = (1,) + (pool,) * nd + (1,)
    strides = (1,) + (stride,) * nd + (1,)
    summed = lax.reduce_window(x.astype(jnp.float32), 0.0, lax.add, window, strides, "SAME")
    ones = jnp.ones(x.shape[:-1] + (1,), jnp.float32)
    counts = lax.reduce_window(ones, 0.0, lax.add, window, strides, "SAME")
    return (summed / counts).astype(x.dtype)


def max_pool_same(x: jnp.ndarray, pool: int, stride: int) -> jnp.ndarray:
    nd = x.ndim - 2
    window = (1,) + (pool,) * nd + (1,)
    strides = (1,) + (stride,) * nd + (1,)
    return lax.reduce_window(x, -jnp.inf, lax.max, window, strides, "SAME")


def l2_pool_same(x: jnp.ndarray, pool: int, stride: int) -> jnp.ndarray:
    """sqrt(avg_pool(x^2)) — reference network.py:673-680."""
    return jnp.sqrt(avg_pool_same(jnp.square(x), pool, stride))


def dense(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None, relu: bool = True) -> jnp.ndarray:
    """Fully-connected layer over the last axis (reference 'fc', network.py:709-716)."""
    y = jnp.matmul(x, w.astype(x.dtype), precision=_precision_for(x))
    if b is not None:
        y = y + b.astype(y.dtype)
    return jnp.maximum(y, 0) if relu else y


def dropout(x: jnp.ndarray, key, keep_prob: float = 0.9, training: bool = True) -> jnp.ndarray:
    """Inverted dropout (reference network.py:752-763; identity at inference)."""
    if not training or keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0).astype(x.dtype)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-norm along axis (reference 'l2norm', network.py:765-767)."""
    sq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) * lax.rsqrt(jnp.maximum(sq, eps))).astype(x.dtype)


def split_separable_conv2d(
    x: jnp.ndarray,
    depthwise_w: jnp.ndarray,
    pointwise_w: jnp.ndarray,
    depthwise_b: Optional[jnp.ndarray] = None,
    pointwise_b: Optional[jnp.ndarray] = None,
    rate: int = 1,
) -> jnp.ndarray:
    """Depthwise conv -> ReLU -> 1x1 pointwise conv -> ReLU
    (reference network.py:218-268; slim defaults add biases and ReLU to both halves).

    depthwise_w: (kh, kw, C, 1); pointwise_w: (1, 1, C, Cout).
    """
    C = x.shape[-1]
    # TF depthwise layout (kh, kw, C, 1) -> grouped-conv HWIO (kh, kw, 1, C)
    rhs = jnp.transpose(depthwise_w, (0, 1, 3, 2)).astype(x.dtype)
    y = lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1, 1),
        padding="SAME",
        rhs_dilation=(rate, rate),
        dimension_numbers=_DIM_NUMBERS[2],
        feature_group_count=C,
        precision=_precision_for(x),
    )
    if depthwise_b is not None:
        y = y + depthwise_b.astype(y.dtype)
    y = jnp.maximum(y, 0)
    return conv(y, pointwise_w, pointwise_b, relu=True)


def conv3d_mixed(
    w: jnp.ndarray,
    varying: jnp.ndarray,
    const2d: jnp.ndarray,
    stride: int = 1,
    qin: bool = False,
) -> jnp.ndarray:
    """conv3d over concat([varying, broadcast_D(const2d)], -1) WITHOUT materializing
    the broadcast: the D-constant channels reduce to 2D convs with the kernel summed
    over its depth taps (exact, including TF-SAME zero-padding edge effects on D).

    w: (3, kh, kw, Cv + Cc, Cout) — depth kernel size must be 3 (the only size the
    model uses); varying: (B, D, h, w, Cv); const2d: (B, h, w, Cc).
    Saves both the HBM write+read of the broadcast volume and half the MXU work of the
    reference formulation (cf. the ref-feature tiling at reference model.py:186,329-330).
    """
    assert w.shape[0] == 3, "depth kernel must be 3"
    Cv = varying.shape[-1]
    D = varying.shape[1]
    wv = w[..., :Cv, :]
    wc = w[..., Cv:, :]

    y = conv(varying, wv, stride=stride, qin=qin)  # (B, D', h', w', Cout)

    # 2D kernels for interior/edge depth positions
    def conv2(kernel2d):
        return conv(const2d, kernel2d, stride=stride)  # (B, h', w', Cout)

    mid = conv2(wc[0] + wc[1] + wc[2])
    if stride == 1:
        # SAME pad (1,1) on D: d=0 misses tap kd=0, d=D-1 misses tap kd=2
        top = conv2(wc[1] + wc[2])
        bot = conv2(wc[0] + wc[1])
        parts = [top[:, None], jnp.broadcast_to(mid[:, None], (mid.shape[0], D - 2) + mid.shape[1:]), bot[:, None]]
    else:
        assert stride == 2 and D % 2 == 0
        # SAME pad (0,1) on D: only the last output (taps 2od..2od+2 with 2od+2 == D)
        # misses tap kd=2
        Do = D // 2
        bot = conv2(wc[0] + wc[1])
        parts = [jnp.broadcast_to(mid[:, None], (mid.shape[0], Do - 1) + mid.shape[1:]), bot[:, None]]
    return y + jnp.concatenate(parts, axis=1)


def conv3d_mixed_bn(
    params: dict,
    varying: jnp.ndarray,
    const2d: jnp.ndarray,
    stride: int = 1,
    relu: bool = True,
    eps: float = 1e-3,
    groups: int = 1,
    qin: bool = False,
) -> jnp.ndarray:
    y = conv3d_mixed(params["w"], varying, const2d, stride=stride, qin=qin)
    y = batch_stat_norm(y, eps=eps, groups=groups)
    return _maybe_quant_act(jnp.maximum(y, 0) if relu else y, nonneg=relu)


# ---------------------------------------------------------------------------
# parameter constructors
# ---------------------------------------------------------------------------


def glorot_normal(key, shape) -> jnp.ndarray:
    """Xavier/Glorot normal over TF conv layout (spatial..., in, out).

    Matches tf.contrib.layers.xavier_initializer(uniform=False) used for every conv
    (network.py:42): stddev^2 = 2 / (fan_in + fan_out) with spatial receptive field.
    """
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def key_for(key, name: str):
    """Deterministic per-layer-name subkey (stable under code reordering).

    Uses crc32, NOT the builtin hash(): str hashing is salted per process
    (PYTHONHASHSEED), which would make seeded inits differ across processes.
    """
    import zlib

    h = int(zlib.crc32(name.encode("utf-8")) & 0x7FFFFFFF)
    return jax.random.fold_in(key, h)


def init_conv(key, name: str, k: int, cin: int, cout: int, nd: int = 2, biased: bool = False) -> dict:
    p = {"w": glorot_normal(key_for(key, name), (k,) * nd + (cin, cout))}
    if biased:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def init_deconv(key, name: str, k: int, cin: int, cout: int, nd: int = 2) -> dict:
    # TF conv_transpose kernel layout: (spatial..., out, in)
    return {"w": glorot_normal(key_for(key, name), (k,) * nd + (cout, cin))}
