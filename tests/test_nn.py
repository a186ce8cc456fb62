"""Tests for NN primitives and modules (reference cnn_wrapper/network.py semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.nn import layers as L
from atvsnet_tpu.nn.blocks import bottleneck, init_bottleneck, init_res_block, res_block
from atvsnet_tpu.nn.fem import fem, fem_shallow, init_fem, init_fem_shallow
from atvsnet_tpu.nn.crm import crm, init_crm
from atvsnet_tpu.nn.aam import attention_activation, attention_aggregate, init_attention
from atvsnet_tpu.nn.refine import init_refine_net, refine_net

KEY = jax.random.PRNGKey(0)


class TestLayers:
    def test_conv_same_matches_manual(self):
        rng = np.random.RandomState(0)
        x = rng.rand(1, 5, 5, 2).astype(np.float32)
        w = rng.rand(3, 3, 2, 4).astype(np.float32)
        out = np.asarray(L.conv(jnp.asarray(x), jnp.asarray(w)))
        assert out.shape == (1, 5, 5, 4)
        # center pixel: plain correlation
        ref = np.einsum("hwio,hwi->o", w, x[0, 1:4, 1:4, :])
        np.testing.assert_allclose(out[0, 2, 2], ref, rtol=1e-5)

    def test_batch_stat_norm_zero_mean_unit_var(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(2, 6, 6, 3).astype(np.float32) * 5 + 2)
        y = np.asarray(L.batch_stat_norm(x, eps=0.0))
        np.testing.assert_allclose(y.mean(axis=(0, 1, 2)), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.var(axis=(0, 1, 2)), 1.0, atol=1e-4)

    def test_deconv_matches_tf_scatter_oracle(self):
        """TF SAME conv*d_transpose == scatter-accumulate with TF's asymmetric padding.

        TF SAME on the equivalent forward conv pads (pad_beg, pad_end) =
        (pad_total//2, rest) with pad_total = k - s for o = n*s — the extra pad goes at
        the END, unlike torch's symmetric padding.
        """
        rng = np.random.RandomState(2)
        x = rng.rand(2, 4, 5, 3).astype(np.float32)
        w = rng.rand(3, 3, 6, 3).astype(np.float32)  # (kh, kw, out, in) TF layout
        s, k = 2, 3
        ours = np.asarray(L.deconv(jnp.asarray(x), jnp.asarray(w), stride=s))
        assert ours.shape == (2, 8, 10, 6)

        B, n_h, n_w, cin = x.shape
        o_h, o_w, cout = n_h * s, n_w * s, w.shape[2]
        pad_beg = max(k - s, 0) // 2
        ref = np.zeros((B, o_h, o_w, cout), np.float32)
        for ih in range(n_h):
            for iw in range(n_w):
                for kh in range(k):
                    for kw in range(k):
                        p, q = ih * s + kh - pad_beg, iw * s + kw - pad_beg
                        if 0 <= p < o_h and 0 <= q < o_w:
                            ref[:, p, q, :] += x[:, ih, iw, :] @ w[kh, kw].T
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_deconv3d_shape_and_linearity(self):
        rng = np.random.RandomState(3)
        x = rng.rand(1, 4, 4, 4, 2).astype(np.float32)
        w = rng.rand(3, 3, 3, 5, 2).astype(np.float32)
        out = np.asarray(L.deconv(jnp.asarray(x), jnp.asarray(w), stride=2))
        assert out.shape == (1, 8, 8, 8, 5)
        out2 = np.asarray(L.deconv(jnp.asarray(2 * x), jnp.asarray(w), stride=2))
        np.testing.assert_allclose(out2, 2 * out, rtol=1e-5)

    def test_avg_pool_same_excludes_padding(self):
        x = jnp.ones((1, 5, 5, 1))
        out = np.asarray(L.avg_pool_same(x, 4, 4))
        # all-ones input: TF SAME avg pool (excluding padding) stays exactly 1
        assert out.shape == (1, 2, 2, 1)
        np.testing.assert_allclose(out, 1.0, atol=1e-6)

    def test_fixed_pad_conv_stride2_shape(self):
        x = jnp.ones((1, 8, 8, 2))
        w = jnp.ones((3, 3, 2, 4))
        out = L.fixed_pad_conv(x, w, stride=2)
        assert out.shape == (1, 4, 4, 4)
        out4 = L.fixed_pad_conv(jnp.ones((1, 8, 8, 2)), w, stride=4)
        assert out4.shape == (1, 2, 2, 4)


class TestBlocks:
    def test_bottleneck_shapes(self):
        p = init_bottleneck(KEY, "b", 8, 16)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 8).astype(np.float32))
        assert bottleneck(p, x, stride=1).shape == (1, 8, 8, 16)
        assert bottleneck(p, x, stride=2).shape == (1, 4, 4, 16)

    def test_bottleneck_identity_shortcut(self):
        p = init_bottleneck(KEY, "b", 8, 8)
        assert "shortcut" not in p
        x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 8).astype(np.float32))
        assert bottleneck(p, x).shape == (1, 8, 8, 8)

    def test_res_block_naming(self):
        p = init_res_block(KEY, "conv1_x", 4, 8, num_block=3)
        assert set(p.keys()) == {"conv1_x_0", "conv1_x_1", "conv1_x"}
        x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 4).astype(np.float32))
        out = res_block(p, x, "conv1_x", 3, stride=2)
        assert out.shape == (1, 4, 4, 8)


class TestFEM:
    def test_fem_quarter_res_32ch(self):
        p = init_fem(KEY, 32)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
        out = fem(p, x)
        assert out.shape == (1, 16, 16, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_fem_shallow(self):
        p = init_fem_shallow(KEY, 16)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
        out = fem_shallow(p, x)
        assert out.shape == (1, 16, 16, 16)


class TestCRM:
    def test_crm_shapes(self):
        p = init_crm(KEY, in_channels=8, base_filter=4, prob_output=True)
        x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 8, 8).astype(np.float32))
        filtered, prob = crm(p, x)
        assert filtered.shape == (1, 8, 8, 8, 4)
        assert prob.shape == (1, 8, 8, 8)
        assert np.isfinite(np.asarray(prob)).all()


class TestAAM:
    def test_attention_activation_matches_per_view_loop(self):
        C, N = 4, 3
        p = init_attention(KEY, "attention_aggregate", C)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 4, 4, 4, C, N).astype(np.float32))
        out = np.asarray(attention_activation(p, x))

        # oracle: reference semantics via explicit per-view convs
        # (network.py:282-351) u_i - s_i + sum_j s_j
        views = [x[..., i] for i in range(N)]
        u = [np.asarray(L.conv(v, p["weight_unique"], relu=True)) for v in views]
        s = [np.asarray(L.conv(v, p["weight_shared"], relu=True)) for v in views]
        s_sum = np.sum(s, axis=0)
        for i in range(N):
            np.testing.assert_allclose(out[..., i], u[i] - s[i] + s_sum, rtol=2e-5, atol=1e-5)

    def test_attention_aggregate_is_convex_combination(self):
        C, N = 2, 4
        p = init_attention(KEY, "attention_aggregate", C)
        x = jnp.ones((1, 4, 4, 4, C, N))
        out = np.asarray(attention_aggregate(p, x))
        # identical views -> weighted sum of identical values = the value
        np.testing.assert_allclose(out, 1.0, rtol=1e-5)


class TestRefineNet:
    def test_shapes(self):
        p = init_refine_net(KEY, photo_ch=12, geo_ch=6, base_filter=4)
        rng = np.random.RandomState(0)
        B, D, h, w = 1, 8, 8, 8
        cost_res, prob_res = refine_net(
            p,
            jnp.asarray(rng.rand(B, D, h, w, 12).astype(np.float32)),
            jnp.asarray(rng.rand(B, D, h, w, 6).astype(np.float32)),
            jnp.asarray(rng.rand(B, D, h, w, 1).astype(np.float32)),
            jnp.asarray(rng.rand(B, D, h, w, 1).astype(np.float32)),
        )
        assert cost_res.shape == (B, D, h, w, 4)
        assert prob_res.shape == (B, D, h, w)


class TestMiscLayers:
    def test_l2_pool(self):
        x = jnp.full((1, 4, 4, 1), 2.0)
        out = np.asarray(L.l2_pool_same(x, 2, 2))
        np.testing.assert_allclose(out, 2.0, rtol=1e-6)

    def test_dense(self):
        x = jnp.ones((2, 3))
        w = jnp.ones((3, 4))
        b = jnp.ones((4,))
        np.testing.assert_allclose(np.asarray(L.dense(x, w, b)), 4.0)
        np.testing.assert_allclose(np.asarray(L.dense(x, -w, None, relu=True)), 0.0)

    def test_dropout_identity_at_inference(self):
        x = jnp.ones((4, 4))
        out = L.dropout(x, jax.random.PRNGKey(0), keep_prob=0.5, training=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_dropout_scales_at_training(self):
        x = jnp.ones((100, 100))
        out = np.asarray(L.dropout(x, jax.random.PRNGKey(0), keep_prob=0.5, training=True))
        assert abs(out.mean() - 1.0) < 0.1
        assert set(np.unique(out)) <= {0.0, 2.0}

    def test_l2_normalize(self):
        x = jnp.asarray(np.random.RandomState(0).randn(5, 7).astype(np.float32))
        out = np.asarray(L.l2_normalize(x, axis=-1))
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)


class TestAttention2D:
    def test_matches_per_view_loop(self):
        from atvsnet_tpu.nn.aam import attention_activation_2d, init_attention_2d

        C, N = 3, 4
        p = init_attention_2d(KEY, "agg2d", C)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 6, 6, C, N).astype(np.float32))
        out = np.asarray(attention_activation_2d(p, x))
        views = [x[..., i] for i in range(N)]
        u = [np.asarray(L.conv(v, p["weight_unique"], relu=True)) for v in views]
        s = [np.asarray(L.conv(v, p["weight_shared"], relu=True)) for v in views]
        s_sum = np.sum(s, axis=0)
        for i in range(N):
            np.testing.assert_allclose(out[..., i], u[i] - s[i] + s_sum, rtol=2e-5, atol=1e-5)


class TestSeparableConv:
    def test_matches_manual(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 6, 6, 3).astype(np.float32))
        dw = jnp.asarray(rng.rand(3, 3, 3, 1).astype(np.float32) - 0.5)
        pw = jnp.asarray(rng.rand(1, 1, 3, 5).astype(np.float32) - 0.5)
        out = L.split_separable_conv2d(x, dw, pw)
        assert out.shape == (1, 6, 6, 5)
        # depthwise at center pixel = per-channel correlation
        patch = np.asarray(x)[0, 1:4, 1:4, :]
        depth_c = np.einsum("hwc,hwc->c", patch, np.asarray(dw)[..., 0])
        manual = np.maximum(np.maximum(depth_c, 0) @ np.asarray(pw)[0, 0], 0)
        np.testing.assert_allclose(np.asarray(out)[0, 2, 2], manual, rtol=1e-5)

class TestAttentionStacked:
    def test_matches_channel_last_layout(self):
        """attention_aggregate_stacked (view-leading) == attention_aggregate (C,N)."""
        import jax
        from atvsnet_tpu.nn.aam import (
            attention_aggregate,
            attention_aggregate_stacked,
            init_attention,
        )

        rng = np.random.RandomState(0)
        p = init_attention(jax.random.PRNGKey(0), "attention_aggregate", 8)
        x = jnp.asarray(rng.rand(4, 1, 6, 8, 10, 8).astype(np.float32))  # (N,B,D,h,w,C)
        a = attention_aggregate_stacked(p, x)
        b = attention_aggregate(p, jnp.moveaxis(x, 0, -1))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestConvInputStacked:
    def test_routing_is_exact(self):
        """The full-res small-Ci route must equal the decomposed formulation."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(1, 4, 120, 224, 8).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, 8, 8).astype(np.float32))
        a = L._conv3d_input_stacked(x, k)
        b = L._conv3d_decomposed(x, k, 1)
        c = L.conv(x, k)  # routed (h*w >= 24000, Ci <= 16)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
        np.testing.assert_allclose(np.asarray(c), np.asarray(b), atol=1e-4)


def test_fp32_precision_policy_validation():
    """A typo'd fp32_precision raises a ValueError naming the knob and the valid
    choices at POLICY CONSTRUCTION (config validation), never from inside conv
    tracing; a valid non-default setting reaches _precision_for via the scope."""
    import pytest

    from atvsnet_tpu import numerics
    from atvsnet_tpu.config import PipelineConfig

    with pytest.raises(ValueError, match="fp32_precision"):
        numerics.NumericsPolicy(fp32_precision="hi")
    with pytest.raises(ValueError, match="fp32_precision"):
        PipelineConfig(fp32_precision="hi")

    x = jnp.ones((1, 4, 4, 2), jnp.float32)
    default = L._precision_for(x)
    with numerics.scope(numerics.NumericsPolicy(fp32_precision="high")):
        assert L._precision_for(x) is not None
        assert L._precision_for(x) != default


def test_act_quant_int8_volume_links():
    """act_quant=int8 (via the numerics scope) stores 5D conv_bn outputs on a
    dynamically scaled int8 lattice (<=255 distinct values, relu outputs >=0) and
    leaves 4D (image feature) links untouched; the default policy leaves
    everything bit-identical."""
    from atvsnet_tpu import numerics

    rng = np.random.RandomState(0)
    p = {"w": jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32) * 0.2)}
    x5 = jnp.asarray(rng.rand(1, 8, 16, 16, 4).astype(np.float32))
    p2 = {"w": jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32) * 0.2)}
    x4 = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))

    base5 = np.asarray(L.conv_bn(p, x5))
    base4 = np.asarray(L.conv_bn(p2, x4))

    with numerics.scope(numerics.NumericsPolicy(act_quant="int8")):
        q5 = np.asarray(L.conv_bn(p, x5))
        q4 = np.asarray(L.conv_bn(p2, x4))

    assert np.array_equal(base4, q4), "4D links must not be quantized"
    assert not np.array_equal(base5, q5)
    # lattice check: values are k * s for integer k in [0, 127]
    nz = q5[q5 > 0]
    s = np.max(np.abs(q5)) / 127.0
    k = nz / s
    np.testing.assert_allclose(k, np.round(k), atol=1e-3)
    assert len(np.unique(q5)) <= 256
    # and the round-trip error is bounded by half a lattice step
    assert np.max(np.abs(base5 - q5)) <= s * 0.51 + 1e-6

    back = np.asarray(L.conv_bn(p, x5))
    np.testing.assert_array_equal(base5, back)


def test_act_quant_int8s_static_lattice():
    """int8s: static 6-sigma lattice, no data-dependent scale. relu links use the
    255-level non-negative lattice (step 6/255); non-relu links the signed
    127-level one (step 6/127). Unknown modes raise at policy construction."""
    from atvsnet_tpu import numerics

    rng = np.random.RandomState(1)
    p = {"w": jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32) * 0.2)}
    x5 = jnp.asarray(rng.rand(1, 8, 16, 16, 4).astype(np.float32))

    base_r = np.asarray(L.conv_bn(p, x5, relu=True))
    base_n = np.asarray(L.conv_bn(p, x5, relu=False))

    with numerics.scope(numerics.NumericsPolicy(act_quant="int8s")):
        q_r = np.asarray(L.conv_bn(p, x5, relu=True))
        q_n = np.asarray(L.conv_bn(p, x5, relu=False))

    s_r, s_n = 6.0 / 255.0, 6.0 / 127.0
    k_r, k_n = q_r / s_r, q_n / s_n
    np.testing.assert_allclose(k_r, np.round(k_r), atol=1e-3)
    np.testing.assert_allclose(k_n, np.round(k_n), atol=1e-3)
    assert q_r.min() >= 0.0 and q_r.max() <= 6.0
    assert q_n.min() >= -6.0 and q_n.max() <= 6.0
    # BN output is unit-variance; at 6 sigma essentially nothing clips, so the
    # round-trip error is bounded by half a lattice step
    assert np.max(np.abs(base_r - q_r)) <= s_r * 0.51 + 1e-6
    assert np.max(np.abs(base_n - q_n)) <= s_n * 0.51 + 1e-6
    # the relu lattice is 2x finer than the signed one
    assert s_r < s_n

    with numerics.scope(numerics.NumericsPolicy(act_quant="int8s", act_quant_range=4.0)):
        q_r4 = np.asarray(L.conv_bn(p, x5, relu=True))
    k4 = q_r4 / (4.0 / 255.0)
    np.testing.assert_allclose(k4, np.round(k4), atol=1e-3)

    with pytest.raises(ValueError, match="act_quant"):
        numerics.NumericsPolicy(act_quant="int8x")


def test_act_quant_int8mxu_integer_conv_path():
    """int8mxu = int8s storage + real int8 convs at qin=True call sites.

    - storage is identical to int8s (qin=False conv_bn outputs match bit-for-bit);
    - qin=True runs the conv with int8 operands / int32 accumulation: post-BN
      outputs stay within a small bound of the float path (accuracy is gated
      e2e by tools/int8_accuracy_probe.py --mode int8mxu);
    - the restored output scale keeps RAW (non-BN) conv magnitudes correct;
    - 4D (image-feature) convs never take the integer path;
    - the lowered HLO of a qin=True volume conv contains an integer convolution.
    """
    rng = np.random.RandomState(3)
    p = {"w": jnp.asarray(rng.randn(3, 3, 3, 4, 4).astype(np.float32) * 0.2)}
    x5 = jnp.asarray(rng.rand(1, 8, 16, 16, 4).astype(np.float32))
    p4 = {"w": jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32) * 0.2)}
    x4 = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))

    from atvsnet_tpu import numerics

    base_bn = np.asarray(L.conv_bn(p, x5, qin=True))
    base_raw = np.asarray(L.conv(x5, p["w"]))
    base_4d = np.asarray(L.conv_bn(p4, x4, qin=True))

    with numerics.scope(numerics.NumericsPolicy(act_quant="int8s")):
        q_store = np.asarray(L.conv_bn(p, x5, qin=False))
    with numerics.scope(numerics.NumericsPolicy(act_quant="int8mxu")):
        q_store_mxu = np.asarray(L.conv_bn(p, x5, qin=False))
        q_bn = np.asarray(L.conv_bn(p, x5, qin=True))
        q_raw = np.asarray(L.conv(x5, p["w"], qin=True))
        q_4d = np.asarray(L.conv_bn(p4, x4, qin=True))

    # storage identical to int8s when the conv stays float
    np.testing.assert_array_equal(q_store, q_store_mxu)
    # 4D untouched (the integer path is volume-only)
    np.testing.assert_array_equal(base_4d, q_4d)
    # BN output (unit variance) deviates by a bounded amount
    assert 0 < np.abs(base_bn - q_bn).max() < 0.5
    # raw conv: scale restored, magnitudes correct within quantization error
    rel = np.abs(base_raw - q_raw).max() / (np.abs(base_raw).max() + 1e-9)
    assert rel < 0.05
    # the compiled program really contains an integer conv
    with numerics.scope(numerics.NumericsPolicy(act_quant="int8mxu")):
        hlo = jax.jit(lambda a: L.conv(a, p["w"], qin=True)).lower(x5).as_text()
    assert "xi8>" in hlo and "xi32>" in hlo, "expected int8 operands / int32 accumulation"

    np.testing.assert_array_equal(base_bn, np.asarray(L.conv_bn(p, x5, qin=True)))
