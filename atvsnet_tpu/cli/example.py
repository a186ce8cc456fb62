"""Example inference CLI — TPU-native equivalent of reference atvsnet/example.py.

    python -m atvsnet_tpu.cli.example --root_path /root/reference/example \
        --example_index 0 --view_num 5 [--params model.npz]

Loads example/{i}/{v}.jpg + {v}_cam.npy (raw images, 1/4-scale intrinsics,
inverse-depth sweep row — reference example.py:326-342), runs the two-view or N-view
pipeline as ONE jitted call (vs the reference's 4 host-staged sess.run stages), writes
pred.npy, pred.jpg and error.json/xlsx vs 0_gt.npy.

Without --params, runs with seeded random weights (the reference checkpoint model.zip
is a missing blob in the snapshot — SURVEY.md §0); outputs remain structurally valid.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from atvsnet_tpu.config import PipelineConfig
from atvsnet_tpu.data.preprocess import load_example_dir
from atvsnet_tpu.eval.errors import calc_error, error_dict, save_error_report
from atvsnet_tpu.utils import log


def save_colormap(path: str, img: np.ndarray) -> None:
    """Viridis visualization (matplotlib if available, cv2 fallback)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, img, cmap="viridis")
    except ImportError:
        import cv2

        lo, hi = np.nanmin(img), np.nanmax(img)
        u8 = np.uint8(255 * (img - lo) / max(hi - lo, 1e-9))
        cv2.imwrite(path, cv2.applyColorMap(u8, cv2.COLORMAP_VIRIDIS))


def run_example(
    root_path: str,
    example_index: int,
    view_num: int,
    params_path: str | None = None,
    savepath: str | None = None,
    max_d: int = 128,
    seed: int = 0,
) -> dict:
    import jax
    import jax.numpy as jnp

    from atvsnet_tpu.utils.runtime import setup_jax

    setup_jax()

    from atvsnet_tpu.models.atvsnet import multi_view_forward, sweep_to_depth
    from atvsnet_tpu.models.tvsnet import init_params, two_view_forward
    from atvsnet_tpu.utils.ckpt import load_params

    data_root = os.path.join(root_path, str(example_index))
    # honor available views (reference example.py:312-324)
    valid = 0
    for v in range(view_num):
        if os.path.exists(os.path.join(data_root, f"{v}.jpg")) and os.path.exists(
            os.path.join(data_root, f"{v}_cam.npy")
        ):
            valid += 1
    if valid != view_num:
        log.warn(f"only {valid} views found (view_num={view_num}), continuing with {valid}")
        view_num = valid

    images, cams, depth_gt = load_example_dir(data_root, view_num)
    cfg = PipelineConfig(view_num=view_num, max_d=max_d)

    if params_path:
        if not os.path.exists(params_path):
            raise SystemExit(f"error: --params checkpoint not found: {params_path}")
        params = load_params(params_path)
        log.info(f"params restored from {params_path}")
    else:
        log.warn("no --params given: using seeded random weights")
        params = init_params(jax.random.PRNGKey(seed), cfg)

    if view_num == 2:
        fwd = jax.jit(lambda p, i, c: two_view_forward(p, i, c, cfg)["depth_up"])
    else:
        fwd = jax.jit(lambda p, i, c: multi_view_forward(p, i, c, cfg)["depth_up"])

    t0 = time.time()
    depth_sweep = np.asarray(fwd(params, jnp.asarray(images), jnp.asarray(cams)))
    compile_and_run = time.time() - t0
    t0 = time.time()
    depth_sweep = np.asarray(fwd(params, jnp.asarray(images), jnp.asarray(cams)))
    steady_state = time.time() - t0
    log.info(f"first call {compile_and_run:.2f}s, steady-state {steady_state:.3f}s")

    disp = depth_sweep.squeeze()
    depth = np.asarray(sweep_to_depth(jnp.asarray(depth_sweep), cfg.inverse_depth)).squeeze()
    # reference example.py:184-186 maps non-positive inverse depth to +inf then 1/x;
    # sweep_to_depth returns 0 there, matching the valid-pixel convention downstream.

    # default under cwd — the reference mount is read-only
    savepath = savepath or os.path.join("results", f"example_{example_index}")
    os.makedirs(savepath, exist_ok=True)
    np.save(os.path.join(savepath, "pred.npy"), depth)
    save_colormap(os.path.join(savepath, "pred.jpg"), disp)

    result = {"savepath": savepath, "runtime_s": steady_state}
    if depth_gt is not None:
        errors, _ = calc_error(np.squeeze(depth), np.squeeze(depth_gt))
        save_error_report(os.path.join(savepath, "error.xlsx"), errors)
        result["errors"] = error_dict(errors)
        log.info("errors:", json.dumps(result["errors"], indent=2))
    log.info(f"results saved to {savepath}")
    return result


def run_examples(
    root_path: str,
    example_indices,
    view_num: int,
    params_path: str | None = None,
    savepath: str | None = None,
    max_d: int = 128,
) -> dict:
    """Batch mode: run several example directories and write a combined summary
    (the reference example driver loops index lists into one error workbook)."""
    summary = {}
    for idx in example_indices:
        sub = os.path.join(savepath, str(idx)) if savepath else None
        summary[str(idx)] = run_example(
            root_path, idx, view_num,
            params_path=params_path, savepath=sub, max_d=max_d,
        )
    out_root = savepath or "results"
    os.makedirs(out_root, exist_ok=True)
    with open(os.path.join(out_root, "examples_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    log.info(f"batch summary -> {os.path.join(out_root, 'examples_summary.json')}")
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root_path", default="/root/reference/example")
    ap.add_argument(
        "--example_index", default="2",
        help="example directory index, or a comma-separated list for batch mode",
    )
    ap.add_argument("--view_num", type=int, default=5)
    ap.add_argument("--params", default=None, help="npz checkpoint path")
    ap.add_argument("--savepath", default=None)
    ap.add_argument("--max_d", type=int, default=128)
    args = ap.parse_args()
    assert args.view_num > 1
    indices = [int(s) for s in str(args.example_index).split(",")]
    if len(indices) == 1:
        run_example(
            args.root_path, indices[0], args.view_num,
            params_path=args.params, savepath=args.savepath, max_d=args.max_d,
        )
    else:
        run_examples(
            args.root_path, indices, args.view_num,
            params_path=args.params, savepath=args.savepath, max_d=args.max_d,
        )


if __name__ == "__main__":
    main()
