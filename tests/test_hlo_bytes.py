"""tools/hlo_bytes: fusion-aware HBM byte accounting over compiled HLO text."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "tools")

from hlo_bytes import account, shape_bytes  # noqa: E402


def test_shape_bytes():
    assert shape_bytes("f32[4,8]") == 128
    assert shape_bytes("bf16[2,3,4]{2,1,0}") == 48
    assert shape_bytes("u8[10]") == 10
    assert shape_bytes("(f32[4], s32[2])") == 24
    assert shape_bytes("pred[]") == 1
    # layout/tiling annotations must not confuse the parser
    assert shape_bytes("f32[128,128]{1,0:T(8,128)}") == 65536


def test_matmul_traffic_order_of_magnitude():
    """C = A @ B at 256x256 f32: true traffic is ~3 x 256KiB; the accounting must
    land within small-constant factors of it (XLA may add a copy or two), and
    never at zero or at cost_analysis-style multiples."""
    n = 256
    a = jnp.ones((n, n), jnp.float32)
    fn = jax.jit(lambda a, b: a @ b)
    hlo = fn.lower(a, a).compile().as_text()
    r = account(hlo)
    expect = 3 * n * n * 4
    assert 0.5 * expect <= r["total_bytes"] <= 4 * expect, r


def test_scan_body_multiplied_by_trip_count():
    """A lax.scan over K iterations must charge its body K times."""
    k, n = 8, 128
    x = jnp.ones((n, n), jnp.float32)

    def step(c, _):
        return c @ x, None

    fn = jax.jit(lambda x: jax.lax.scan(step, x, None, length=k)[0])
    hlo = fn.lower(x).compile().as_text()
    r = account(hlo)
    per_iter = 3 * n * n * 4
    # XLA may unroll the tiny loop — accept either form, but the total must
    # reflect all K matmuls, not one
    assert r["total_bytes"] >= 0.5 * k * per_iter, r
    assert r["total_bytes"] <= 6 * k * per_iter, r


def test_elementwise_chain_fuses_to_two_buffers():
    """y = ((x+1)*2-3)/4 fuses into one kernel: bytes ~ read x + write y, NOT
    4x that — the exact over-count cost_analysis makes and this tool must not."""
    n = 512
    x = jnp.ones((n, n), jnp.float32)
    fn = jax.jit(lambda x: ((x + 1.0) * 2.0 - 3.0) / 4.0)
    hlo = fn.lower(x).compile().as_text()
    r = account(hlo)
    two_buffers = 2 * n * n * 4
    assert r["total_bytes"] <= 1.5 * two_buffers, r
    assert r["total_bytes"] >= 0.9 * two_buffers, r


def test_pipeline_account_runs():
    """The full (small) pipeline program parses and yields plausible totals."""
    from atvsnet_tpu.config import PipelineConfig
    from atvsnet_tpu.data.synthetic import synthetic_scene
    from atvsnet_tpu.models.atvsnet import multi_view_forward
    from atvsnet_tpu.models.tvsnet import init_params

    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    images, cams = synthetic_scene(view_num=3, H=32, W=32, D=8, seed=0)
    fwd = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg)["depth_up"])
    hlo = fwd.lower(params, jnp.asarray(images), jnp.asarray(cams)).compile().as_text()
    r = account(hlo)
    # at least the parameters must be read once (few MB), and totals are finite
    assert r["total_bytes"] > 1e6
    assert np.isfinite(r["total_bytes"])


def test_wide_tuple_while_with_index_comments_is_charged():
    """TPU HLO writes /*index=N*/ markers inside >=6-element tuple shapes; the
    '=' in them broke the instruction regex and silently dropped the pair-scan
    while loops from the account (flagship program: 39.9 GB parsed vs 224.4 GB
    with the loops). The while (and its body, x trip count) must be charged."""
    hlo = """
HloModule m

%body (p: (s32[], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256])) -> (s32[], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256]) {
  %p = (s32[]{:T(128)}, f32[256,256]{1,0}, f32[256,256]{1,0}, f32[256,256]{1,0}, f32[256,256]{1,0}, /*index=5*/f32[256,256]{1,0}, f32[256,256]{1,0}) parameter(0)
  %iv = s32[]{:T(128)} get-tuple-element((s32[], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256]) %p), index=0
  %one = s32[]{:T(128)} constant(1)
  %iv1 = s32[]{:T(128)} add(s32[]{:T(128)} %iv, s32[]{:T(128)} %one)
  %a = f32[256,256]{1,0} get-tuple-element((s32[], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256]) %p), index=1
  %b = f32[256,256]{1,0} get-tuple-element((s32[], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256]) %p), index=2
  %mm = f32[256,256]{1,0} dot(f32[256,256]{1,0} %a, f32[256,256]{1,0} %b), lhs_contracting_dims={1}, rhs_contracting_dims={0}
  ROOT %t = (s32[]{:T(128)}, f32[256,256]{1,0}, f32[256,256]{1,0}, f32[256,256]{1,0}, f32[256,256]{1,0}, /*index=5*/f32[256,256]{1,0}, f32[256,256]{1,0}) tuple(%iv1, %mm, %b, %b, %b, /*index=5*/%b, %b)
}

%cond (p: (s32[], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256])) -> pred[] {
  %p = (s32[]{:T(128)}, f32[256,256]{1,0}, f32[256,256]{1,0}, f32[256,256]{1,0}, f32[256,256]{1,0}, /*index=5*/f32[256,256]{1,0}, f32[256,256]{1,0}) parameter(0)
  %iv = s32[]{:T(128)} get-tuple-element((s32[], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256]) %p), index=0
  %k = s32[]{:T(128)} constant(4)
  ROOT %lt = pred[]{:T(128)} compare(s32[]{:T(128)} %iv, s32[]{:T(128)} %k), direction=LT
}

ENTRY %main (x: f32[256,256]) -> f32[256,256] {
  %x = f32[256,256]{1,0} parameter(0)
  %z = s32[]{:T(128)} constant(0)
  %init = (s32[]{:T(128)}, f32[256,256]{1,0}, f32[256,256]{1,0}, f32[256,256]{1,0}, f32[256,256]{1,0}, /*index=5*/f32[256,256]{1,0}, f32[256,256]{1,0}) tuple(%z, %x, %x, %x, %x, /*index=5*/%x, %x)
  %w = (s32[]{:T(128)}, f32[256,256]{1,0}, f32[256,256]{1,0}, f32[256,256]{1,0}, f32[256,256]{1,0}, /*index=5*/f32[256,256]{1,0}, f32[256,256]{1,0}) while((s32[], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256]) %init), condition=%cond, body=%body
  ROOT %out = f32[256,256]{1,0} get-tuple-element((s32[], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256], f32[256,256]) %w), index=3
}
"""
    r = account(hlo)
    assert r["while_trip_counts"] == {"body": 4, "cond": 4} or 4 in r["while_trip_counts"].values(), r
    # 4 iterations x one 256x256 matmul (3 buffers) is the dominant traffic
    per_iter = 3 * 256 * 256 * 4
    assert r["total_bytes"] >= 4 * per_iter, r
