"""Golden end-to-end regression: seeded params + fixed scene -> committed outputs.

Pins the numerics half of the north star (BASELINE.md "bit-comparable depth maps"):
perf work cannot silently change pipeline outputs. Regenerate deliberately with
`python tools/make_golden.py` when an intentional numerics change lands, and say why
in the commit message.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_e2e.npz")


def _cases():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_golden import golden_cases

    return golden_cases()


@pytest.mark.parametrize("case", [c[0] for c in _cases()])
def test_golden_outputs(case):
    assert os.path.exists(GOLDEN), "tests/golden/golden_e2e.npz missing — run tools/make_golden.py"
    name, cfg, forward = next(c for c in _cases() if c[0] == case)

    from atvsnet_tpu.models.tvsnet import init_params
    from tests._utils import synthetic_scene

    params = init_params(jax.random.PRNGKey(0), cfg)
    images, cams = synthetic_scene(
        view_num=cfg.view_num, H=cfg.max_h, W=cfg.max_w, D=cfg.max_d, seed=7
    )
    out = jax.jit(lambda p, i, c: forward(p, i, c, cfg))(
        params, jnp.asarray(images), jnp.asarray(cams)
    )
    with np.load(GOLDEN) as z:
        ref_depth = z[f"{name}/depth"]
        ref_up = z[f"{name}/depth_up"]
    np.testing.assert_allclose(
        np.asarray(out["depth"], np.float32), ref_depth, rtol=1e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["depth_up"], np.float32), ref_up, rtol=1e-4, atol=5e-5
    )
