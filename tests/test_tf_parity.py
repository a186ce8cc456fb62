"""Stage-level numerical parity vs reference TF activations.

Gated: runs only when BOTH artifact files exist —

    ATVSNET_TF_WEIGHTS_NPZ      (default runs/tf_weights.npz)
        produced by tools/dump_tf_checkpoint.py in a TF-1 env
    ATVSNET_TF_ACTIVATIONS_NPZ  (default runs/tf_activations.npz)
        produced by tools/dump_tf_activations.py in the same env

The reference model.zip is a missing blob in this snapshot, so these tests are the
ready-to-run half of the bit-comparability north star (BASELINE.md): the day weights
appear, dump both npz files and this suite pins every pipeline stage. The pipeline
runs with reference_compat=True (the reference's visual-hull camera indexing) and the
XLA soft-argmin so the comparison is apples-to-apples in fp32.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

WEIGHTS = os.environ.get("ATVSNET_TF_WEIGHTS_NPZ", "runs/tf_weights.npz")
ACTS = os.environ.get("ATVSNET_TF_ACTIVATIONS_NPZ", "runs/tf_activations.npz")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(WEIGHTS) and os.path.exists(ACTS)),
    reason="TF weight/activation dumps not present (model.zip is a missing blob)",
)

# conv/BN chains in fp32 accumulate ~1e-4; depth maps are convex sweep combinations
TOL_FEAT = dict(rtol=1e-3, atol=1e-3)
TOL_VOL = dict(rtol=2e-3, atol=2e-3)
TOL_DEPTH = dict(rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def parity():
    from atvsnet_tpu.config import PipelineConfig
    from atvsnet_tpu.models.atvsnet import multi_view_forward
    from atvsnet_tpu.models.tvsnet import extract_features, init_params
    from atvsnet_tpu.utils.ckpt import load_tf_npz

    z = np.load(ACTS)
    images = z["inputs/images"][None]           # (1, N, H, W, 3)
    cams = z["inputs/cams"][None].astype(np.float32)
    N = images.shape[1]
    D = int(cams[0, 0, 1, 3, 2]) or 128
    cfg = PipelineConfig(
        view_num=N, max_d=D, max_h=images.shape[2], max_w=images.shape[3],
        compute_dtype="float32", reference_compat=True, softargmin_impl="xla",
    )
    params = load_tf_npz(init_params(jax.random.PRNGKey(0), cfg), WEIGHTS)
    out = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg))(
        params, jnp.asarray(images), jnp.asarray(cams)
    )
    feats = extract_features(params, jnp.asarray(images), cfg)
    shallow = extract_features(params, jnp.asarray(images), cfg, shallow=True)
    return z, out, np.asarray(feats), np.asarray(shallow), N


def test_feature_parity(parity):
    z, _, feats, shallow, N = parity
    for v in range(N):
        np.testing.assert_allclose(feats[0, v], z[f"fem/{v}"], **TOL_FEAT)
        np.testing.assert_allclose(shallow[0, v], z[f"shallow/{v}"], **TOL_FEAT)


def test_pair_stage_parity(parity):
    z, out, _, _, N = parity
    for p in range(N - 1):
        np.testing.assert_allclose(
            np.asarray(out["prob_volumes"])[p, 0], z[f"pair{p}/prob"], **TOL_VOL
        )
        np.testing.assert_allclose(
            np.asarray(out["depth_views"])[p, 0], z[f"pair{p}/depth_view"], **TOL_DEPTH
        )
        np.testing.assert_allclose(
            np.asarray(out["refined_prob_volumes"])[p, 0],
            z[f"pair{p}/refined_prob"],
            **TOL_VOL,
        )


def test_aggregate_and_final_parity(parity):
    z, out, _, _, _ = parity
    np.testing.assert_allclose(np.asarray(out["prob_volume_agg"])[0], z["agg/prob"], **TOL_VOL)
    np.testing.assert_allclose(np.asarray(out["depth_agg_initial"])[0], z["agg/depth"], **TOL_DEPTH)
    np.testing.assert_allclose(np.asarray(out["depth"])[0], z["final/depth"], **TOL_DEPTH)
    np.testing.assert_allclose(np.asarray(out["depth_up"])[0], z["final/depth_up"], **TOL_DEPTH)
