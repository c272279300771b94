"""Regenerate the committed ``demo_assets/`` tree — the repo's analogue of the
reference's in-tree visual proof (``dog_images/`` sample inputs +
``CAM_images/`` overlay outputs, /root/reference/dog_images, CAM_images).

The reference ships real dog photos; this repo is dataset-free, so the assets
come from the synthetic blob-colour task of examples/synthetic_cam_demo.py:

* ``demo_assets/inputs/``    — sample input images (class = blob colour)
* ``demo_assets/cam/``       — top-1 CAM JET overlays (the CAM example's flow)
* ``demo_assets/gradcam/``   — top-1 Grad-CAM overlays (the beyond-reference
  gradient-weighted maps, valid at any tap depth — cam.py)
* ``demo_assets/annotated/`` — evaluate-style top-1 label annotation
  (the evaluate example's cv2.putText output, reference evaluate :34-49)

Deterministic (fixed seeds) so CI can regenerate them
(tests/test_examples_integration.py::test_make_demo_assets_regenerates).
Run:  python -m examples.make_demo_assets [out_dir]
"""

import os
import sys

import cv2
import numpy as np

from dorknet_tpu.network import Trainer
from dorknet_tpu.optimisers import SGDMomentum
from dorknet_tpu.cam import compute_cam_scores, compute_gradcam_scores
from examples.synthetic_cam_demo import build_net, make_batch

CLASS_NAMES = {0: "blue_blob", 1: "green_blob", 2: "red_blob", 3: "teal_blob"}


def main(out_dir="demo_assets", steps=60, seed=0, n_images=4):
    rng = np.random.RandomState(seed)
    np.random.seed(seed)
    net = build_net()
    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
    for _ in range(steps):
        X, _, oh = make_batch(rng)
        tr.step(X, oh)

    for sub in ("inputs", "cam", "gradcam", "annotated"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    X, y, _ = make_batch(rng, B=n_images)
    correct = 0
    for i in range(n_images):
        img = (X[i].transpose(1, 2, 0) + 128.0).astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, "inputs", "img{}_{}.png".format(
            i, CLASS_NAMES[int(y[i])])), img)

        scores, cams = compute_cam_scores(net, X[i:i + 1], top_k=1,
                                          terminal_layer_name="features",
                                          out_size=img.shape[0])
        pred = int(np.argmax(np.asarray(scores)))
        correct += int(pred == y[i])
        heat = cv2.applyColorMap(np.uint8(255 * np.asarray(cams)[0]),
                                 cv2.COLORMAP_JET).astype(np.float32)
        blended = heat + img.astype(np.float32)
        cv2.imwrite(os.path.join(out_dir, "cam", "img{}_true-{}_pred-{}.png"
                                 .format(i, CLASS_NAMES[int(y[i])],
                                         CLASS_NAMES[pred])),
                    np.uint8(255 * blended / blended.max()))

        g_scores, gcams = compute_gradcam_scores(
            net, X[i:i + 1], top_k=1, terminal_layer_name="features",
            out_size=img.shape[0])
        g_heat = cv2.applyColorMap(np.uint8(255 * np.asarray(gcams)[0]),
                                   cv2.COLORMAP_JET).astype(np.float32)
        g_blend = g_heat + img.astype(np.float32)
        cv2.imwrite(os.path.join(out_dir, "gradcam",
                                 "img{}_true-{}_pred-{}.png".format(
                                     i, CLASS_NAMES[int(y[i])],
                                     CLASS_NAMES[int(np.argmax(
                                         np.asarray(g_scores)))])),
                    np.uint8(255 * g_blend / g_blend.max()))

        ann = cv2.resize(img, (192, 192), interpolation=cv2.INTER_NEAREST)
        cv2.putText(ann, CLASS_NAMES[pred], (8, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 255, 100), 2)
        cv2.imwrite(os.path.join(out_dir, "annotated",
                                 "img{}_pred-{}.png".format(i,
                                                            CLASS_NAMES[pred])),
                    ann)
    print("demo assets written to {} (top-1 correct: {}/{})".format(
        out_dir, correct, n_images))
    return correct


if __name__ == "__main__":
    main(*(sys.argv[1:2] or []))
