"""Example CLI over the real bundled example data (reference example/{0,1,2}).

Random weights (the reference checkpoint is a missing blob) — assertions cover
structure, finiteness, and the view-count fallback, not accuracy. Skipped when the
read-only reference mount is absent. max_d=8 keeps the CPU runtime reasonable.
"""

import json
import os

import numpy as np
import pytest

ROOT = "/root/reference/example"

pytestmark = pytest.mark.skipif(not os.path.isdir(ROOT), reason="reference mount absent")


def test_two_view_real_example(tmp_path):
    from atvsnet_tpu.cli.example import run_example

    out = run_example(ROOT, 2, view_num=2, savepath=str(tmp_path), max_d=8)
    pred = np.load(os.path.join(str(tmp_path), "pred.npy"))
    assert pred.ndim == 2 and np.isfinite(pred).all()
    assert os.path.exists(os.path.join(str(tmp_path), "pred.jpg"))
    assert "errors" in out  # example 2 ships 0_gt.npy
    with open(os.path.join(str(tmp_path), "error.json")) as f:
        errors = json.load(f)
    assert all(np.isfinite(v) for v in errors.values())


def test_batch_mode_with_view_fallback(tmp_path):
    """Batch over {0, 2} at view_num=5: example 2 has only 2 views, exercising the
    reference's valid-view fallback (example.py:312-324) inside batch mode."""
    from atvsnet_tpu.cli.example import run_examples

    summary = run_examples(ROOT, [0, 2], view_num=5, savepath=str(tmp_path), max_d=8)
    assert set(summary) == {"0", "2"}
    for idx in ("0", "2"):
        pred = np.load(os.path.join(str(tmp_path), idx, "pred.npy"))
        assert np.isfinite(pred).all()
        assert "errors" in summary[idx]
    assert os.path.exists(os.path.join(str(tmp_path), "examples_summary.json"))
