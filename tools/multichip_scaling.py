"""Functional weak-scaling validation of the SPMD pipeline on virtual devices.

Runs the sharded forward at 1/2/4/8 virtual CPU devices with the DATA axis scaled
with the mesh (weak scaling: one scene per data shard) and checks (a) outputs match
the single-device reference per scene, (b) the program compiles + executes at every
mesh shape. Virtual CPU devices share one host, so wall-clock is NOT a speedup
measurement — this validates the scaling STRUCTURE (shardings, collectives) that the
driver's dryrun exercises at one shape. Real-chip scaling needs real chips.

Usage: python tools/multichip_scaling.py   (forces an 8-virtual-device CPU platform)
"""

from __future__ import annotations

import os
import sys
import time

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
from atvsnet_tpu.models.tvsnet import init_params  # noqa: E402
from atvsnet_tpu.parallel.mesh import auto_mesh_shape, make_mesh  # noqa: E402
from atvsnet_tpu.parallel.pipeline import jit_sharded_forward  # noqa: E402
from atvsnet_tpu.data.synthetic import synthetic_scene  # noqa: E402


def main():
    N, H, W, D = 5, 64, 64, 16
    cfg = PipelineConfig(view_num=N, max_d=D, max_h=H, max_w=W)
    params = init_params(jax.random.PRNGKey(0), cfg)
    images1, cams1 = synthetic_scene(view_num=N, H=H, W=W, D=D, seed=7)

    ref = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg))(
        params, jnp.asarray(images1), jnp.asarray(cams1)
    )
    ref_depth = np.asarray(ref["depth_up"], np.float32)

    for n_dev in (1, 2, 4, 8):
        n_data, n_view = auto_mesh_shape(n_dev, N - 1)
        mesh = make_mesh(n_data, n_view, devices=jax.devices()[:n_dev])
        B = n_data  # weak scaling: one scene per data shard
        images = np.concatenate([images1] * B, axis=0)
        cams = np.concatenate([cams1] * B, axis=0)
        fwd = jit_sharded_forward(mesh, cfg)
        out = fwd(params, jnp.asarray(images), jnp.asarray(cams))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fwd(params, jnp.asarray(images), jnp.asarray(cams))
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        got = np.asarray(out["depth_up"], np.float32)
        err = max(
            float(np.max(np.abs(got[b] - ref_depth[0]))) for b in range(B)
        )
        status = "OK" if err < 1e-4 else f"MISMATCH {err:.2e}"
        print(
            f"devices={n_dev} mesh=(data={n_data}, view={n_view}) B={B}: "
            f"{dt * 1e3:7.1f} ms/step, per-scene max|Δ| vs 1-device = {err:.2e}  {status}",
            flush=True,
        )
        assert err < 1e-4, err


if __name__ == "__main__":
    main()
