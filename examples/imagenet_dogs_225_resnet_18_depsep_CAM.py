"""Class Activation Map inference on a trained ResNet-18-depsep.

For each image in ./dog_images: top-3 class predictions and a JET-colormap CAM
overlay per class, written to CAM_outputs/<image>/ (the reference CAM
example's outputs, examples/imagenet_dogs_225_resnet_18_depsep_CAM.py).

TPU-first: the two forwards (scores + res8 feature tap), the dense-weight
projection, bilinear upsample, relu and min-max normalisation run as ONE
jitted XLA program (dorknet_tpu.cam.compute_cam_scores) — and unlike the
reference, the tap does NOT mutate BN running stats (SURVEY §3.3). Only the
colormap overlay remains host-side cv2 work.
"""

import json
import os

import cv2
import numpy as np

from dorknet_tpu.cam import compute_cam_scores, compute_gradcam_scores
from dorknet_tpu.data_loading import ImagePreprocessor
from dorknet_tpu.models import ResNet18

# Reference constants, env-overridable so CI can run this exact __main__
# body against a synthetic checkpoint (tests/test_dogs_example_scripts.py)
EXPERIMENT = os.environ.get("DORKNET_EXPERIMENT", "DogsImageNet225ResNet18DepSep")
CHECKPOINT = os.environ.get("DORKNET_CHECKPOINT", "epoch_26_testacc_0.686.h5")
CLASS_MAP = os.environ.get("DORKNET_CLASS_MAP",
                           "./imagenet_dog_class_names/num_to_dog_name_map.json")
IMAGE_DIR = os.environ.get("DORKNET_IMAGE_DIR", "./dog_images")
OUT_ROOT = os.environ.get("DORKNET_CAM_OUT", "CAM_outputs")
IMAGE_SIZE = int(os.environ.get("DORKNET_IMAGE", "225"))
# DORKNET_GRADCAM=1 switches the map computation to Grad-CAM
# (dorknet_tpu.cam.compute_gradcam_scores): gradient-weighted maps, valid at
# ANY tap depth and with any head — beyond-reference; the default is the
# reference's classifier-weight CAM
USE_GRADCAM = os.environ.get("DORKNET_GRADCAM", "0") == "1"


def overlay_heatmap(bgr_image, cam01):
    """JET heatmap blended onto the image, uint8 (reference :43-49 behaviour)."""
    heat = cv2.applyColorMap(np.uint8(255 * cam01), cv2.COLORMAP_JET).astype(np.float32)
    blended = heat + bgr_image.astype(np.float32)
    return np.uint8(255 * blended / blended.max())


def run_one(net, preprocessor, class_names, image_path, out_dir):
    chw = preprocessor.load_image(image_path)
    cam_fn = compute_gradcam_scores if USE_GRADCAM else compute_cam_scores
    scores, cams = cam_fn(net, chw[None], top_k=3,
                          terminal_layer_name="res8",
                          out_size=IMAGE_SIZE)
    ranked = np.argsort(np.asarray(scores))[::-1][:3]
    original = cv2.resize(chw.transpose(1, 2, 0) + 128.0,
                          (IMAGE_SIZE, IMAGE_SIZE))
    os.makedirs(out_dir, exist_ok=True)
    for rank, (cls, cam) in enumerate(zip(ranked, np.asarray(cams))):
        name = class_names[str(cls)]
        cv2.imwrite(os.path.join(out_dir, "{}_{}.png".format(rank, name)),
                    overlay_heatmap(original, cam))


if __name__ == "__main__":
    with open(CLASS_MAP) as f:
        class_names = json.load(f)
    preprocessor = ImagePreprocessor(image_size=(IMAGE_SIZE, IMAGE_SIZE),
                                     crop_mode="center")
    net = ResNet18("", load_layers=False)
    net.load_network_from_json_and_h5(
        os.path.join(EXPERIMENT, EXPERIMENT + ".json"),
        os.path.join(EXPERIMENT, CHECKPOINT))
    net.to_gpu()

    for fname in os.listdir(IMAGE_DIR):
        if not os.path.isdir(os.path.join(IMAGE_DIR, fname)):
            run_one(net, preprocessor, class_names,
                    os.path.join(IMAGE_DIR, fname),
                    os.path.join(OUT_ROOT, os.path.splitext(fname)[0]))

    print("CAM complete, results saved in CAM_outputs directory")
