"""Generate the committed golden end-to-end outputs (tests/golden/golden_e2e.npz).

Pins the pipeline numerics for the bit-comparability north star (BASELINE.md): seeded
params + a fixed synthetic scene -> depth/depth_up at two shapes, fp32 on CPU. Any
future perf work that silently changes outputs trips tests/test_golden.py.

Run: python tools/make_golden.py   (forces the CPU platform itself)
"""

import os
import sys

# Must match tests/conftest.py EXACTLY: the virtual-device-count flag changes XLA CPU
# thread partitioning and therefore reduction order; with random weights the soft
# argmin amplifies those ulps to ~0.1 depth units. Golden files are only comparable
# under the same platform config the tests run with.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from atvsnet_tpu.config import PipelineConfig  # noqa: E402
from atvsnet_tpu.models.atvsnet import multi_view_forward  # noqa: E402
from atvsnet_tpu.models.tvsnet import init_params, two_view_forward  # noqa: E402
from atvsnet_tpu.parallel.pipeline import multi_view_forward_spmd  # noqa: E402
from atvsnet_tpu.data.synthetic import synthetic_scene  # noqa: E402


def golden_cases():
    """(name, cfg, forward) triples — keep in sync with tests/test_golden.py."""
    return [
        ("mv3_32", PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32), multi_view_forward),
        ("mv5_64", PipelineConfig(view_num=5, max_d=16, max_h=64, max_w=64), multi_view_forward),
        ("tv2_32", PipelineConfig(view_num=2, max_d=8, max_h=32, max_w=32), two_view_forward),
        (
            "mv3_32_compat",
            PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32, reference_compat=True),
            multi_view_forward,
        ),
        # the vmap/SPMD pipeline (mesh=None here): pins the pair-materialized variant
        # so op-selection/routing drift vs the scan pipeline trips the suite
        (
            "mv5_64_spmd",
            PipelineConfig(view_num=5, max_d=16, max_h=64, max_w=64),
            multi_view_forward_spmd,
        ),
    ]


def compute_case(cfg, forward):
    params = init_params(jax.random.PRNGKey(0), cfg)
    images, cams = synthetic_scene(view_num=cfg.view_num, H=cfg.max_h, W=cfg.max_w, D=cfg.max_d, seed=7)
    out = jax.jit(lambda p, i, c: forward(p, i, c, cfg))(
        params, jnp.asarray(images), jnp.asarray(cams)
    )
    depth = out["depth"]
    return np.asarray(depth, np.float32), np.asarray(out["depth_up"], np.float32)


def main():
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests", "golden")
    os.makedirs(outdir, exist_ok=True)
    arrays = {}
    for name, cfg, forward in golden_cases():
        depth, depth_up = compute_case(cfg, forward)
        arrays[f"{name}/depth"] = depth
        arrays[f"{name}/depth_up"] = depth_up
        print(f"{name}: depth {depth.shape} mean={depth.mean():.6f}  depth_up {depth_up.shape}")
    path = os.path.join(outdir, "golden_e2e.npz")
    np.savez_compressed(path, **arrays)
    print("wrote", path)


if __name__ == "__main__":
    main()
