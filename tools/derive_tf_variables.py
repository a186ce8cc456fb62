"""Statically derive the reference TF graph's trainable-variable names.

Walks /root/reference/cnn_wrapper/atvsnet.py with the `ast` module — NOT by running
TF — and expands each layer-DSL call into the variable names the cnn_wrapper runtime
would create (cnn_wrapper/network.py):

  conv(name=X, biased=B)        -> X/kernel [+ X/bias]          (tf.layers.conv{2,3}d)
  conv_bn(name=X)               -> X/conv{R}d/kernel            (scope X, center=False
                                                                 => no beta; moving
                                                                 stats are dead weight
                                                                 under training-mode BN)
  deconv_bn(name=X)             -> X/conv{R}d_transpose/kernel
  attention_aggregation(name=X) -> X/attention_activation/weight_{unique,shared}
                                                                 (network.py:313-343)
  res_block(name=X, num_block=n)-> bottleneck scopes X_0..X_{n-2}, X (network.py:605-616)
      each scope S              -> S/preact/beta, S/conv{1,2,3}/{weights,biases}
                                   [+ S/shortcut/{weights,biases} iff depth != depth_in
                                    (network.py:578-580); stride-only shortcuts are
                                    max-pools with no variables]

Channel counts are simulated through the feed graph (only needed to decide bottleneck
shortcut-conv presence; both res_block chains start from 3-channel images).

Used by tests/test_tf_name_map.py to assert utils.ckpt.tf_name_map is name-complete.
"""

from __future__ import annotations

import ast
from typing import Dict, List, Set

# conv_bn/deconv_bn scope suffix depends on input rank: volumes (5-D) in the CRM /
# refinement / AAM-output nets, images (4-D) in the FEMs.
CLASS_RANK = {
    "ResNetDS2SPP": 2,
    "ResNetDS2SPP_shallow_f16": 2,
    "StackedUNet": 3,
    "StackedUNet_prob": 3,
    "CostVolRefineNet": 3,
    "AttAggregation": 3,
    "AttAggregation_keepchannel": 3,
    "AttAggregation_refine": 3,
    "AttAggregation_refine_keepchannel": 3,
    "OutputConv": 3,
    "OutputConv_refine": 3,
}

# input channel counts per feed name (only consulted when a res_block needs depth_in;
# both FEM chains start at the 3-channel image).
INPUT_CHANNELS = {"data": 3, "photo_group": 48, "geo_group": 19, "prob_vol": 1, "vis_hull": 1}


def _const(node, env):
    """Evaluate a literal / base_filter-arithmetic expression."""
    return eval(compile(ast.Expression(node), "<expr>", "eval"), {}, dict(env))


def _kw(call: ast.Call, name: str, env, default=None):
    for k in call.keywords:
        if k.arg == name:
            return _const(k.value, env)
    return default


def _bottleneck_vars(scope: str, has_shortcut: bool) -> List[str]:
    out = [f"{scope}/preact/beta"]
    if has_shortcut:
        out += [f"{scope}/shortcut/weights", f"{scope}/shortcut/biases"]
    for c in ("conv1", "conv2", "conv3"):
        out += [f"{scope}/{c}/weights", f"{scope}/{c}/biases"]
    return out


def _expand_chain(calls: List[ast.Call], env, rank: int, channels: Dict[str, int], out: Set[str]):
    """calls = [feed(...), op1, op2, ...] in execution order."""
    feed = calls[0]
    srcs = [_const(a, env) for a in feed.args]
    cur = sum(channels.get(s, 0) for s in srcs) if len(srcs) > 1 else channels.get(srcs[0], 0)
    # multi-input feeds are consumed by add (keep first) or concat (sum); decided below.
    first_src_ch = channels.get(srcs[0], 0)

    for call in calls[1:]:
        op = call.func.attr
        name = _kw(call, "name", env)
        if op == "conv":
            out.add(f"{name}/kernel")
            if _kw(call, "biased", env, False):
                out.add(f"{name}/bias")
            cur = _const(call.args[1], env)
        elif op == "conv_bn":
            out.add(f"{name}/conv{rank}d/kernel")
            if _kw(call, "center", env, False):
                out.add(f"{name}/batch_normalization/beta")
            cur = _const(call.args[1], env)
        elif op == "deconv_bn":
            out.add(f"{name}/conv{rank}d_transpose/kernel")
            cur = _const(call.args[1], env)
        elif op == "attention_aggregation":
            out.add(f"{name}/attention_activation/weight_unique")
            if _kw(call, "second_weight", env, False):
                out.add(f"{name}/attention_activation/weight_shared")
        elif op == "res_block":
            depth = _const(call.args[1], env)
            num_block = _kw(call, "num_block", env, 1)
            scopes = (
                [name]
                if num_block == 1
                else [f"{name}_{i}" for i in range(num_block - 1)] + [name]
            )
            depth_in = cur
            for s in scopes:
                out.update(_bottleneck_vars(s, has_shortcut=(depth != depth_in)))
                depth_in = depth
            cur = depth
        elif op == "add":
            cur = first_src_ch
        elif op == "concat":
            pass  # cur already holds the sum over srcs
        # avg_pool / image_resize / get_shape_by_name: channel-preserving, no vars
        if name is not None:
            channels[name] = cur


def derive_class_variables(tree: ast.Module, class_name: str) -> Set[str]:
    """All trainable variable names class `class_name`'s setup() creates."""
    cls = next(
        n for n in tree.body if isinstance(n, ast.ClassDef) and n.name == class_name
    )
    setup = next(
        n for n in cls.body if isinstance(n, ast.FunctionDef) and n.name == "setup"
    )
    env: Dict[str, int] = {}
    out: Set[str] = set()
    channels = dict(INPUT_CHANNELS)
    rank = CLASS_RANK[class_name]
    for stmt in setup.body:
        if isinstance(stmt, ast.Assign) and isinstance(stmt.targets[0], ast.Name):
            try:
                env[stmt.targets[0].id] = _const(stmt.value, env)
            except Exception:
                pass  # get_shape_by_name etc. — not needed for variable derivation
            continue
        if not isinstance(stmt, ast.Expr):
            continue
        # unroll the fluent chain: Call(func=Attribute(value=Call(...)))
        calls: List[ast.Call] = []
        node = stmt.value
        while isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute):
            calls.append(node)
            node = node.func.value
        calls.reverse()  # now feed(...) first
        if not calls or calls[0].func.attr != "feed":
            continue
        _expand_chain(calls, env, rank, channels, out)
    return out


def derive_atvsnet_variables(atvsnet_py: str) -> Set[str]:
    """Every trainable variable of the full A-TVSNet graph (model.py:346-468).

    The model instantiates ResNetDS2SPP, ResNetDS2SPP_shallow_f16, StackedUNet_prob,
    CostVolRefineNet, the two attention aggregators and the two output convs, all
    under reuse=tf.AUTO_REUSE — variable names are global and shared across towers.
    (AttAggregation == AttAggregation_keepchannel + OutputConv under reuse.)
    """
    with open(atvsnet_py) as f:
        tree = ast.parse(f.read())
    names: Set[str] = set()
    for cls in (
        "ResNetDS2SPP",
        "ResNetDS2SPP_shallow_f16",
        "StackedUNet_prob",
        "CostVolRefineNet",
        "AttAggregation",
        "AttAggregation_refine",
    ):
        names |= derive_class_variables(tree, cls)
    return names


if __name__ == "__main__":
    import sys

    path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/cnn_wrapper/atvsnet.py"
    for n in sorted(derive_atvsnet_variables(path)):
        print(n)
