"""fp32 conv precision middle path: accuracy on TPU at HIGHEST / HIGH / DEFAULT.

VERDICT r2 item 10. Runs the mv5_64 golden case (tools/make_golden.py) on the
current default device once per PipelineConfig.fp32_precision setting (fresh
subprocesses keep the compile caches apart) and reports the depth-map deltas of
high/default vs the highest-precision run, plus highest vs the committed CPU
golden for scale. Pair with `bench.py --dtype float32 --fp32-precision ...` for
the speed side.

Run: python tools/fp32_precision_check.py
"""

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def child(precision: str, out_path: str) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from atvsnet_tpu.config import PipelineConfig
    from atvsnet_tpu.models.atvsnet import multi_view_forward
    from atvsnet_tpu.models.tvsnet import init_params
    from atvsnet_tpu.data.synthetic import synthetic_scene

    cfg = PipelineConfig(view_num=5, max_d=16, max_h=64, max_w=64,
                         compute_dtype="float32", fp32_precision=precision)
    params = init_params(jax.random.PRNGKey(0), cfg)
    images, cams = synthetic_scene(view_num=5, H=64, W=64, D=16, seed=7)
    out = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg))(
        params, jnp.asarray(images), jnp.asarray(cams)
    )
    np.savez(out_path, depth=np.asarray(out["depth"], np.float32),
             depth_up=np.asarray(out["depth_up"], np.float32))


def main() -> None:
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = {}
    with tempfile.TemporaryDirectory() as td:
        for prec in ("highest", "high", "default"):
            path = os.path.join(td, prec + ".npz")
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__), "--child", prec, path],
                cwd=repo,
            )
            if rc != 0:
                raise RuntimeError(f"child {prec} failed rc={rc}")
            with np.load(path) as z:
                outs[prec] = {k: z[k] for k in z.files}

    def delta(a, b):
        d = np.abs(a - b)
        denom = np.maximum(np.abs(b), 1e-6)
        return float(d.max()), float((d / denom).max())

    report = {}
    for prec in ("high", "default"):
        amax, rmax = delta(outs[prec]["depth"], outs["highest"]["depth"])
        report[f"{prec}_vs_highest"] = {"max_abs": amax, "max_rel": rmax}
    golden = os.path.join(repo, "tests", "golden", "golden_e2e.npz")
    if os.path.exists(golden):
        with np.load(golden) as z:
            amax, rmax = delta(outs["highest"]["depth"], z["mv5_64/depth"])
        report["highest_vs_cpu_golden"] = {"max_abs": amax, "max_rel": rmax,
                                           "note": "cross-platform reduction-order floor"}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
    else:
        main()
