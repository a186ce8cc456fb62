"""TF-checkpoint import is name-complete.

Cross-checks utils.ckpt.tf_name_map against a statically derived list of every
trainable variable the reference A-TVSNet graph creates (tools/derive_tf_variables.py
walks /root/reference/cnn_wrapper/atvsnet.py with `ast` — an oracle independent of
this repo's parameter-tree structure). Non-trainable BN moving statistics are dead
weight (every reference BN runs in training mode) and are intentionally unmapped.
"""

import os
import sys

import jax
import pytest

REF = "/root/reference/cnn_wrapper/atvsnet.py"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.skipif(not os.path.exists(REF), reason="reference mount not available")
def test_tf_name_map_is_name_complete():
    from derive_tf_variables import derive_atvsnet_variables

    from atvsnet_tpu.config import PipelineConfig
    from atvsnet_tpu.models.tvsnet import init_params
    from atvsnet_tpu.utils.ckpt import _flatten, tf_name_map

    cfg = PipelineConfig(view_num=3, max_d=8, max_h=32, max_w=32)
    params = init_params(jax.random.PRNGKey(0), cfg)
    mapping = tf_name_map(params)
    derived = derive_atvsnet_variables(REF)

    assert set(mapping.keys()) == derived, (
        sorted(derived - set(mapping.keys())),
        sorted(set(mapping.keys()) - derived),
    )
    # bijection: every param leaf is importable exactly once
    paths = list(mapping.values())
    assert len(set(paths)) == len(paths)
    assert set(paths) == set(_flatten(params).keys())
