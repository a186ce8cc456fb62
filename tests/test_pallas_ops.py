"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU runs)."""

import numpy as np
import jax.numpy as jnp

from atvsnet_tpu.geometry.depth_regression import prob2depth
from atvsnet_tpu.ops.softargmin import softargmin


class TestSoftargminKernel:
    def test_matches_prob2depth(self):
        rng = np.random.RandomState(0)
        B, D, h, w = 2, 16, 8, 24
        cost = jnp.asarray(rng.randn(B, D, h, w).astype(np.float32))
        ds = jnp.array([0.5, 1.0])
        di = jnp.array([0.05, 0.1])
        ref = np.asarray(prob2depth(cost, D, ds, di))
        got = np.asarray(softargmin(cost, D, ds, di, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_peaked_volume(self):
        B, D, h, w = 1, 8, 4, 8
        cost = np.zeros((B, D, h, w), np.float32)
        cost[:, 3] = -60.0
        got = np.asarray(
            softargmin(jnp.asarray(cost), D, jnp.array([1.0]), jnp.array([0.5]), interpret=True)
        )
        np.testing.assert_allclose(got, 1.0 + 3 * 0.5, atol=1e-4)
