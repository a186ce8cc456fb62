"""Dump reference-graph activations for module-level parity testing.

Run in a TF-1.x environment with the reference repo on PYTHONPATH and the extracted
checkpoint (the snapshot's model.zip is a missing blob — this script exists so the
parity harness is ready the day weights appear):

    python tools/dump_tf_activations.py \
        --reference /path/to/A-TVSNet --ckpt /path/to/model/model.ckpt \
        --example_dir /path/to/example/0 --view_num 5 --max_d 128 \
        --out tf_activations.npz

It rebuilds the reference N-view graph exactly as example.py:51-216 does (per-pair
TVSNet_base_siamese -> AttAggregation -> per-pair TVSNet_refine -> AttAggregation_refine
-> prob2depth_upsample), restores the checkpoint, runs ONE forward on the example
images, and saves:

    inputs/images (N, H, W, 3) raw BGR      inputs/cams (N, 2, 4, 4)
    fem/<v>            deep features per view (H/4, W/4, 32)
    shallow/<v>        shallow features per view (H/4, W/4, 16)
    pair<p>/prob       per-pair regularized cost volume (D, h, w)
    pair<p>/depth_view swapped-pair depth (h, w, 1)
    agg/prob           AAM1 aggregated prob volume (D, h, w)
    agg/depth          soft-argmin of agg/prob (h, w, 1)
    pair<p>/refined_prob  refined prob volume (D, h, w)
    final/depth        (h, w, 1)      final/depth_up (4h, 4w, 1)

tests/test_tf_parity.py consumes this file (+ the weights npz from
tools/dump_tf_checkpoint.py) and asserts stage-by-stage agreement of this framework's
pipeline. Tolerances are stated there.
"""

import argparse
import os
import sys

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", required=True, help="path to the reference repo root")
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--example_dir", required=True)
    ap.add_argument("--view_num", type=int, default=5)
    ap.add_argument("--max_d", type=int, default=128)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    sys.path.insert(0, os.path.join(args.reference, "atvsnet"))

    try:
        import tensorflow.compat.v1 as tf  # type: ignore

        tf.disable_v2_behavior()
    except ImportError:
        import tensorflow as tf  # type: ignore

    import cv2  # type: ignore
    from atvsnet import model as ref_model  # type: ignore

    FLAGS = tf.app.flags.FLAGS
    FLAGS.view_num = args.view_num
    FLAGS.max_d = args.max_d
    FLAGS.inverse_depth = True
    FLAGS.batch_size = 1

    images, cams = [], []
    for v in range(args.view_num):
        images.append(cv2.imread(os.path.join(args.example_dir, f"{v}.jpg")))
        cams.append(np.load(os.path.join(args.example_dir, f"{v}_cam.npy")))
    images_np = np.stack(images)[None].astype(np.float32)   # (1, N, H, W, 3)
    cams_np = np.stack(cams)[None].astype(np.float32)       # (1, N, 2, 4, 4)

    N = args.view_num
    D = args.max_d
    images_t = tf.constant(images_np)
    cams_t = tf.constant(cams_np)
    depth_start = cams_t[:, 0, 1, 3, 0]
    depth_interval = cams_t[:, 0, 1, 3, 1]

    out = {"inputs/images": images_np[0], "inputs/cams": cams_np[0]}
    fetches = {}

    # per-view features (model.py:419-425) + shallow pair features (model.py:143-154)
    for v in range(N):
        fetches[f"fem/{v}"] = ref_model.TVSNet_feature_extraction(images_t, v)
    shallow_ref, _ = ref_model.extract_feature_shallow(images_t, 0, 1)
    fetches["shallow/0"] = shallow_ref
    for v in range(1, N):
        _, shallow_v = ref_model.extract_feature_shallow(images_t, 0, v)
        fetches[f"shallow/{v}"] = shallow_v

    # per-pair base nets (example.py:144-151 composition)
    pair_outputs = []
    for p, view_i in enumerate(range(1, N)):
        depth_b2, prob_vol_b2, filtered_cost, depth_view = ref_model.TVSNet_base_siamese(
            images_t, cams_t, D, depth_start, depth_interval, view_i, ref_i=0
        )
        pair_outputs.append((depth_b2, prob_vol_b2, filtered_cost, depth_view))
        fetches[f"pair{p}/prob"] = prob_vol_b2
        fetches[f"pair{p}/depth_view"] = depth_view

    # AAM1 (example.py:153-158)
    stacked = tf.stack([po[2] for po in pair_outputs], axis=-1)
    agg_cost = ref_model.cost_volume_aggregation(stacked, keepchannel=True)
    agg_prob = ref_model.output_conv(agg_cost)   # squeezes internally (model.py:132-135)
    agg_depth = ref_model.prob2depth(agg_prob, D, depth_start, depth_interval)
    fetches["agg/prob"] = agg_prob
    fetches["agg/depth"] = agg_depth

    # per-pair refinement (example.py:160-174)
    refined_costs = []
    for p, view_i in enumerate(range(1, N)):
        refined_prob, refined_cost = ref_model.TVSNet_refine(
            agg_depth, pair_outputs[p][3], agg_prob, agg_cost,
            images_t, cams_t, D, depth_start, depth_interval, view_i, ref_i=0,
        )
        refined_costs.append(refined_cost)
        fetches[f"pair{p}/refined_prob"] = refined_prob

    # AAM2 + upsampled soft-argmin (example.py:176-181)
    stacked2 = tf.stack(refined_costs, axis=-1)
    agg2 = ref_model.cost_volume_aggregation_refine(stacked2, keepchannel=True)
    prob2 = ref_model.output_conv_refine(agg2)
    depth, depth_up = ref_model.prob2depth_upsample(prob2, D, depth_start, depth_interval)
    fetches["final/depth"] = depth
    fetches["final/depth_up"] = depth_up

    saver = tf.train.Saver(tf.trainable_variables())
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        saver.restore(sess, args.ckpt)
        values = sess.run(fetches)

    for k, v in values.items():
        out[k] = np.asarray(v)[0]  # drop batch dim
    np.savez_compressed(args.out, **out)
    print(f"{len(out)} arrays -> {args.out}")


if __name__ == "__main__":
    main()
