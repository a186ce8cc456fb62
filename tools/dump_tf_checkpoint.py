"""Dump the reference TF-1 checkpoint to an npz consumable by utils.ckpt.load_tf_npz.

Run this in any environment with TensorFlow installed (the reference checkpoint
model.zip is a missing blob in this snapshot, and TF is not installed here):

    python tools/dump_tf_checkpoint.py --ckpt ../model/model.ckpt --out tf_weights.npz

Then import on the TPU side:

    from atvsnet_tpu.models.tvsnet import init_params
    from atvsnet_tpu.utils.ckpt import load_tf_npz
    params = load_tf_npz(init_params(jax.random.PRNGKey(0), cfg), "tf_weights.npz")

Only conv kernels, slim biases, preact betas and attention weight banks are needed
(every BN runs in batch-stats mode — moving statistics are dead weight, see
utils/ckpt.py docstring).
"""

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    try:
        import tensorflow.compat.v1 as tf  # type: ignore
    except ImportError:
        import tensorflow as tf  # type: ignore

    reader = tf.train.load_checkpoint(args.ckpt)
    shape_map = reader.get_variable_to_shape_map()
    out = {}
    for name in sorted(shape_map):
        if "Adam" in name or "Momentum" in name or "global_step" in name:
            continue
        if name.endswith("moving_mean") or name.endswith("moving_variance"):
            continue  # unused: BN runs in batch-stats mode
        out[name] = np.asarray(reader.get_tensor(name))
        print(f"{name:70s} {out[name].shape}")
    np.savez(args.out, **out)
    print(f"{len(out)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
