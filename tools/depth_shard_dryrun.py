"""Depth-plane ('depth') mesh-axis validation — SURVEY §2.3 item iii (VERDICT r2 #9).

Full-resolution 480x896 D=128 *training* currently needs remat (config.py remat);
sharding the D plane axis of the cost volumes over a 'depth' mesh axis is the
principled alternative: each device holds D/n_depth planes of every (B, D, h, w, C)
volume and XLA inserts the halo exchanges the 3D conv stencils need.

This script (runs on an 8-virtual-CPU mesh; re-execs itself like __graft_entry__ when
the ambient platform is the single TPU chip):
  1. checks numerics: depth-sharded SPMD forward == unsharded forward;
  2. runs one depth-sharded TRAIN step (grads flow through the halo exchanges);
  3. compares per-device compiled memory (XLA memory_analysis) for
     remat / no-remat / depth-sharded no-remat train steps at a scaled shape —
     the capacity claim the axis exists to serve.

Run: python tools/depth_shard_dryrun.py [n_devices]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(n_devices: int = 8) -> None:
    try:
        import jax

        inline_ok = len(jax.devices()) >= n_devices
    except Exception:
        inline_ok = False
    if not inline_ok:
        if os.environ.get("_ATVSNET_DRYRUN_CHILD") == "1":
            raise RuntimeError("subprocess still lacks devices")
        env = dict(os.environ)
        env["_ATVSNET_DRYRUN_CHILD"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={n_devices}")
        env["XLA_FLAGS"] = " ".join(flags)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        rc = subprocess.call([sys.executable, os.path.abspath(__file__), str(n_devices)],
                             env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        if rc != 0:
            raise RuntimeError(f"depth_shard_dryrun subprocess failed rc={rc}")
        return

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from atvsnet_tpu.config import PipelineConfig, TrainConfig
    from atvsnet_tpu.models.train import TrainState, jit_sharded_train_step, make_optimizer
    from atvsnet_tpu.models.tvsnet import init_params
    from atvsnet_tpu.parallel.mesh import make_mesh
    from atvsnet_tpu.parallel.pipeline import multi_view_forward_spmd
    from atvsnet_tpu.data.synthetic import synthetic_scene

    view_num, D, H, W = 3, 16, 64, 64
    cfg = PipelineConfig(view_num=view_num, max_d=D, max_h=H, max_w=W, softargmin_impl="xla")
    params = init_params(jax.random.PRNGKey(0), cfg)
    images, cams = synthetic_scene(view_num=view_num, H=H, W=W, D=D, seed=3)
    images, cams = jnp.asarray(images), jnp.asarray(cams)

    # --- 1. numerics: depth-sharded forward vs unsharded ---
    mesh_d = make_mesh(1, 2, n_depth=n_devices // 2)
    fwd_plain = jax.jit(lambda p, i, c: multi_view_forward_spmd(p, i, c, cfg, None))
    fwd_shard = jax.jit(
        lambda p, i, c: multi_view_forward_spmd(p, i, c, cfg, mesh_d),
        in_shardings=(NamedSharding(mesh_d, P()),) * 3,
    )
    a = fwd_plain(params, images, cams)
    b = fwd_shard(params, images, cams)
    for k in ("depth", "depth_up", "depth_agg_initial"):
        np.testing.assert_allclose(np.asarray(b[k]), np.asarray(a[k]), rtol=2e-4, atol=1e-4)
    print(f"depth-shard numerics OK: mesh=(data=1, view=2, depth={n_devices // 2}), "
          f"forward matches unsharded")

    # --- 2. one depth-sharded train step ---
    tcfg = TrainConfig()
    tx = make_optimizer(tcfg)
    rng = np.random.RandomState(0)
    gt = (0.5 + 0.05 * D * rng.rand(1, H // 4, W // 4, 1)).astype(np.float32)
    batch = {"images": images, "cams": cams, "depth_gt": jnp.asarray(gt)}
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jit_sharded_train_step(mesh_d, cfg, tcfg, tx)
    state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    print(f"depth-shard train step OK: loss={loss:.4f}")

    # --- 3. per-device compiled memory: remat vs depth-shard (capacity claim) ---
    def peak_bytes(mesh, remat):
        c = cfg.replace(remat=remat)
        stepf = jit_sharded_train_step(mesh, c, tcfg, tx)
        compiled = stepf.lower(
            TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), batch
        ).compile()
        try:
            ma = compiled.memory_analysis()
            return int(ma.temp_size_in_bytes + ma.output_size_in_bytes)
        except Exception:
            return -1

    mesh_flat = make_mesh(1, 2)  # 'view' only, depth replicated
    rows = [
        ("no-remat, depth replicated (view=2)", peak_bytes(mesh_flat, False)),
        ("remat,    depth replicated (view=2)", peak_bytes(mesh_flat, True)),
        (f"no-remat, depth sharded (view=2, depth={n_devices // 2})", peak_bytes(mesh_d, False)),
    ]
    for name, byt in rows:
        print(f"  per-device temp+out bytes  {name}: "
              + (f"{byt / 1e6:.1f} MB" if byt >= 0 else "memory_analysis unavailable"))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
