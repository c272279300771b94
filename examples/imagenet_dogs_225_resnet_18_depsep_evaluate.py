"""Evaluate a trained ResNet-18-depsep checkpoint.

Two modes, mirroring the reference evaluate example's behaviour:
* optional full val-set accuracy (`--verify`, needs the dataset), and
* top-5 prediction annotation for every image in ./dog_images, written to
  ./dog_images/outputs.

Usage: python -m examples.imagenet_dogs_225_resnet_18_depsep_evaluate \
           [--verify] [--checkpoint epoch_26_testacc_0.686.h5] [--int8]

``--int8`` serves through the QuantizedInferenceRunner (BN-folded, per-channel
int8 weights on the MXU) instead of the fp32 forward — the production serving
configuration.
"""

import argparse
import json
import os

import cv2
import numpy as np

from dorknet_tpu.data_loading import ImageDataLoader, ImagePreprocessor
from dorknet_tpu.models import ResNet18

# Reference constants, env-overridable so CI can run this exact __main__
# body against a synthetic checkpoint (tests/test_dogs_example_scripts.py)
EXPERIMENT = os.environ.get("DORKNET_EXPERIMENT", "DogsImageNet225ResNet18DepSep")
CLASS_MAP = os.environ.get("DORKNET_CLASS_MAP",
                           "./imagenet_dog_class_names/num_to_dog_name_map.json")
IMAGE_SIZE = int(os.environ.get("DORKNET_IMAGE", "225"))
BATCH_SIZE = int(os.environ.get("DORKNET_BATCH", "60"))
VAL_SET_SIZE = int(os.environ.get("DORKNET_VAL_SIZE", str(120 * 50)))
IMAGE_DIR = os.environ.get("DORKNET_IMAGE_DIR", "./dog_images")


def load_trained_network(checkpoint):
    net = ResNet18("", load_layers=False)
    net.load_network_from_json_and_h5(
        os.path.join(EXPERIMENT, EXPERIMENT + ".json"),
        os.path.join(EXPERIMENT, checkpoint))
    return net


def check_val_accuracy(net, preprocessor, batch_size=BATCH_SIZE, runner=None):
    data_root = os.environ.get("DORKNET_DATA", os.path.expanduser("~/Datasets"))
    loader = ImageDataLoader(
        os.path.join(data_root, "ImageNet2012/ILSVRC2012_dogs/val_img"),
        batch_size, preprocessor, start_thread=True)
    try:
        n_val = VAL_SET_SIZE
        if runner is not None:
            correct = 0
            for probs, y, _ in runner.predict_iter(
                    loader.pull_batch(n_val // batch_size)):
                correct += int((probs.argmax(axis=1) == np.asarray(y)).sum())
            acc = correct / n_val
        else:
            acc = net.test(loader.pull_batch(n_val // batch_size), batch_size,
                           n_val)
        print("Test acc: {}".format(acc))
        return acc
    finally:
        loader.stop_thread()


def annotate_images(net, preprocessor, class_names, im_dir=IMAGE_DIR,
                    runner=None):
    out_dir = os.path.join(im_dir, "outputs")
    os.makedirs(out_dir, exist_ok=True)
    for fname in os.listdir(im_dir):
        src = os.path.join(im_dir, fname)
        if os.path.isdir(src):
            continue
        X = preprocessor.load_image(src)[None]
        if runner is not None:
            scores = runner.predict_probs(X)[0]
        else:
            _, batch_scores = net.forward(X, y_one_hot=None, test_mode=True)
            scores = np.asarray(batch_scores)[0]
        ranked = np.argsort(scores)[::-1]
        print("###########################")
        for cls in ranked[:5]:
            print(fname, cls, scores[cls], class_names[str(cls)])
        annotated = cv2.imread(src)
        cv2.putText(annotated, class_names[str(ranked[0])],
                    (annotated.shape[0] // 10, annotated.shape[1] // 10),
                    cv2.FONT_HERSHEY_SIMPLEX,
                    min(annotated.shape[0], annotated.shape[1]) / 1000,
                    (0, 255, 100), 5)
        cv2.imwrite(os.path.join(out_dir, fname), annotated)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--verify", action="store_true",
                    help="measure val-set accuracy (needs the dataset)")
    ap.add_argument("--checkpoint", default=os.environ.get(
        "DORKNET_CHECKPOINT", "epoch_26_testacc_0.686.h5"))
    ap.add_argument("--int8", action="store_true",
                    help="serve through the int8 QuantizedInferenceRunner")
    args = ap.parse_args()

    with open(CLASS_MAP) as f:
        class_names = json.load(f)
    preprocessor = ImagePreprocessor(image_size=(IMAGE_SIZE, IMAGE_SIZE),
                                     crop_mode="center")
    network = load_trained_network(args.checkpoint)
    runner = None
    if args.int8:
        from dorknet_tpu.network import QuantizedInferenceRunner

        runner = QuantizedInferenceRunner(network, batch_size=BATCH_SIZE)
    if args.verify:
        check_val_accuracy(network, preprocessor, runner=runner)
    annotate_images(network, preprocessor, class_names, runner=runner)
