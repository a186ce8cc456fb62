"""Fast coverage for the committed provenance tools (tools/scene_e2e_eval.py):
the scoring path must reproduce calc_error on hand-built PFM fixtures, skip
probability maps, and nearest-downsample full-res gt onto the prediction grid.
"""

import json
import os
import subprocess
import sys

import cv2
import numpy as np

from atvsnet_tpu.data.pfm import load_pfm, save_pfm
from atvsnet_tpu.eval.errors import calc_error

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scene_e2e_eval_matches_calc_error(tmp_path):
    rng = np.random.RandomState(0)
    h, w, scale = 12, 16, 4
    scene = tmp_path / "scene"
    out = tmp_path / "out"
    (scene / "gt_depths").mkdir(parents=True)
    (out / "depths_atvsnet").mkdir(parents=True)

    expected = []
    for i in range(3):
        gt_full = (1.0 + rng.rand(h * scale, w * scale)).astype(np.float32)
        pred = (1.0 + rng.rand(h, w)).astype(np.float32)
        save_pfm(str(scene / "gt_depths" / f"{i:08d}.pfm"), gt_full)
        save_pfm(str(out / "depths_atvsnet" / f"{i:08d}.pfm"), pred)
        # decoy prob map: the scorer must ignore it
        save_pfm(str(out / "depths_atvsnet" / f"{i:08d}_prob.pfm"), pred * 0 + 0.9)
        gtq = cv2.resize(gt_full, (w, h), interpolation=cv2.INTER_NEAREST)
        e, _ = calc_error(pred, gtq)
        expected.append(e)
    expected_mean = np.mean(np.stack(expected), axis=0)

    js = tmp_path / "m.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scene_e2e_eval.py"),
         "--scene_dir", str(scene), "--eval_out", str(out), "--json_out", str(js)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    got = json.load(open(js))["metrics"]
    assert abs(got["mae"] - expected_mean[0]) < 1e-6
    assert abs(got["inlier_ratios_3"] - expected_mean[11]) < 1e-6
    assert json.loads(r.stdout.strip().splitlines()[-1])["views"] == 3

    # roundtrip sanity on the fixtures themselves
    assert load_pfm(str(scene / "gt_depths" / "00000000.pfm")).shape == (h * scale, w * scale)


def test_bench_compile_parse_compiler_options():
    """tools/bench_compile --compiler-option parsing: JSON-typed values where
    possible (the XLA effort knobs are floats), raw strings otherwise."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_compile import parse_compiler_options

    assert parse_compiler_options(None) == {}
    assert parse_compiler_options([]) == {}
    got = parse_compiler_options(
        ["exec_time_optimization_effort=-1.0", "memory_fitting_effort=0.5",
         "some_flag=true", "name=tag"]
    )
    assert got == {
        "exec_time_optimization_effort": -1.0,
        "memory_fitting_effort": 0.5,
        "some_flag": True,
        "name": "tag",
    }
