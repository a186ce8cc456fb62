"""Parameter checkpointing and TF-1 reference-checkpoint import.

Native format: flat .npz keyed by '/'-joined pytree paths (dependency-free, fast).

Reference import: the TF checkpoint (reference model/model.ckpt, restored at
example.py:122-124) stores variables under the cnn_wrapper scope discipline
(network.py:196,313-321; slim scopes in bottleneck network.py:568-599). Because every
BatchNorm runs in training mode (is_training=True everywhere, e.g. model.py:349), the
moving statistics are dead weight — only conv kernels, slim biases, preact betas and the
attention weight banks matter. TF kernel layouts equal ours ((spatial..., in, out);
transpose kernels (spatial..., out, in)), so import is a pure rename:

    tf name                                         pytree path
    <scope>/conv{2,3}d/kernel                       .../<scope>/w        (conv_bn)
    <scope>/kernel                                  .../<scope>/w        (plain conv)
    <scope>/conv{2,3}d_transpose/kernel             .../<scope>/w        (deconv_bn)
    <block>/preact/beta                             .../<block>/preact/beta
    <block>/{shortcut,conv1,conv2,conv3}/weights    .../w
    <block>/{shortcut,conv1,conv2,conv3}/biases     .../b
    <agg>/attention_activation/weight_{unique,shared}  aam*_att/weight_*

Use `tf_name_map(params)` to emit the full mapping; a one-off script run in a TF-capable
environment dumps the ckpt to npz with tf names, and `load_tf_npz` renames it in.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(params, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in params.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> dict:
    root: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return root


def save_params(path: str, params: dict) -> None:
    flat = _flatten(params)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_params(path: str) -> dict:
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


def _tf_conv_name(scope: str, nd: int, bn: bool, transpose: bool = False) -> str:
    if not bn:
        return f"{scope}/kernel"
    op = f"conv{nd}d_transpose" if transpose else f"conv{nd}d"
    return f"{scope}/{op}/kernel"


def tf_name_map(params: dict) -> Dict[str, str]:
    """Map TF-checkpoint variable names -> flat pytree paths for the current tree.

    Inference rules follow the module structure: entries with only 'w' inside a module
    that applies BN map to <scope>/conv{2,3}d/kernel; plain convs (fusion1, output
    convs, conv_b2_6_2, global_refine*cost_vol, shallow feature) map to <scope>/kernel;
    deconvs (w with (s..., out, in) used by deconv_bn) to conv{2,3}d_transpose/kernel.
    """
    flat = _flatten(params)
    mapping: Dict[str, str] = {}

    plain_conv_scopes = {
        "fusion1",
        "global_refine_shallow_feature",
        "conv_b2_6_2",
        "attention_prob_vol",
        "attention_prob_vol_refine",
        "global_refined_cost_vol",
    }
    # U-Net decoder scopes are deconv_bn: conv_b*_{4,5,6}_0 and global_refine_3dconv{4,5,6}_0
    deconv_markers = ("4_0", "5_0", "6_0")

    for path in flat:
        parts = path.split("/")
        leaf = parts[-1]
        scope = parts[-2] if len(parts) >= 2 else ""
        arr = flat[path]

        if leaf == "beta":  # preact BN beta: <block>/preact/beta
            block = parts[-3]
            mapping[f"{block}/preact/beta"] = path
        elif leaf in ("weight_unique", "weight_shared"):
            agg = "attention_aggregate" if "aam1" in parts[0] else "attention_aggregate_refine"
            mapping[f"{agg}/attention_activation/{leaf}"] = path
        elif leaf == "b":
            mapping[f"{'/'.join(parts[1:-1])}/biases"] = path
        elif leaf == "w":
            nd = arr.ndim - 2
            rel = "/".join(parts[1:-1])
            if scope in ("shortcut", "conv1", "conv2", "conv3"):  # slim bottleneck convs
                mapping[f"{rel}/weights"] = path
            elif scope in plain_conv_scopes:
                mapping[f"{rel}/kernel"] = path
            elif any(scope.endswith(m) for m in deconv_markers):
                mapping[_tf_conv_name(rel, nd, bn=True, transpose=True)] = path
            else:
                mapping[_tf_conv_name(rel, nd, bn=True)] = path
    return mapping


def save_params_orbax(path: str, params: dict) -> None:
    """Orbax checkpoint (async, multi-host-safe) — production alternative to npz."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params_orbax(path: str, template: dict) -> dict:
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path), template)


def save_train_state(path: str, state) -> None:
    """Checkpoint a full TrainState (params + optimizer state + step) for resume.

    The reference has no save/resume at all (load-only tf.train.Saver.restore,
    SURVEY.md §5). Leaves are stored in tree-flatten order with the treedef string as
    a structural fingerprint.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(str(treedef).encode(), dtype=np.uint8)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def load_train_state(path: str, template):
    """Restore a TrainState saved by save_train_state into `template`'s structure."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    with np.load(path) as z:
        saved_def = z["__treedef__"].tobytes().decode()
        if saved_def != str(treedef):
            raise ValueError("checkpoint structure does not match the current TrainState")
        new_leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_tf_npz(params: dict, npz_path: str, strict: bool = True) -> dict:
    """Fill `params` from an npz of {tf_var_name: array} (dumped from the TF ckpt)."""
    mapping = tf_name_map(params)
    flat = _flatten(params)
    with np.load(npz_path) as z:
        available = set(z.files)
        for tf_name, path in mapping.items():
            if tf_name in available:
                arr = z[tf_name]
                if arr.shape != flat[path].shape:
                    raise ValueError(f"shape mismatch {tf_name}: {arr.shape} vs {flat[path].shape}")
                flat[path] = arr
            elif strict:
                raise KeyError(f"missing TF variable: {tf_name}")
    return _unflatten(flat)
