"""Class Activation Map inference on trained ResNet-18-depsep.

Mirrors the reference CAM example (examples/imagenet_dogs_225_resnet_18_depsep_CAM.py):
loads the trained net from json+h5, and for each image in ./dog_images produces
JET-colormap CAM overlays for the top-3 classes in CAM_outputs/.

TPU-first: the two forwards (scores + res8 tap), the dense-weight projection,
bilinear upsample, relu and min-max normalisation all run in ONE jitted XLA
program (dorknet_tpu.cam.compute_cam_scores) — and unlike the reference, the
feature-tap forward does NOT mutate BN running stats (SURVEY §3.3). Only the
colormap overlay stays on host (cv2)."""

import json
import os

import cv2
import numpy as np

from dorknet_tpu.data_loading import ImagePreprocessor
from dorknet_tpu.models import ResNet18
from dorknet_tpu.network import FeedForwardNetwork
from dorknet_tpu.cam import compute_cam_scores

BATCH_SIZE = 60
im_dir = "./dog_images"
number_of_classes = 120


def save_outputs(save_dir, orig_image, output_cam_list, class_name_list):
    orig_image = cv2.resize(orig_image, output_cam_list[0].shape)
    os.makedirs(save_dir, exist_ok=True)
    for ind, (class_name, cam_array) in enumerate(
            zip(class_name_list, output_cam_list)):
        cam_array = show_cam_on_image(orig_image, cam_array)
        cv2.imwrite(os.path.join(save_dir, str(ind) + "_" + class_name + ".png"),
                    cam_array)


def show_cam_on_image(img, mask):
    heatmap = cv2.applyColorMap(np.uint8(255 * mask), cv2.COLORMAP_JET)
    heatmap = np.float32(heatmap)
    cam = heatmap + np.float32(img)
    cam = cam / np.max(cam)
    return np.uint8(255 * cam)


if __name__ == "__main__":
    preprocessor = ImagePreprocessor(image_size=(225, 225), crop_mode="center")
    experiment_name = "DogsImageNet225ResNet18DepSep"
    num_to_dog_name_map_fname = "./imagenet_dog_class_names/num_to_dog_name_map.json"
    with open(num_to_dog_name_map_fname, "r") as f:
        num_to_dog_name_map = json.load(f)
    network = ResNet18("", load_layers=False)
    network.load_network_from_json_and_h5(
        os.path.join(experiment_name, experiment_name + ".json"),
        os.path.join(experiment_name, "epoch_26_testacc_0.686.h5"))
    network.to_gpu()

    for im_path in os.listdir(im_dir):
        if not os.path.isdir(os.path.join(im_dir, im_path)):
            im = preprocessor.load_image(os.path.join(im_dir, im_path))
            X = im.reshape((1,) + im.shape)
            scores, cams = compute_cam_scores(network, X, top_k=3,
                                              terminal_layer_name="res8")
            best = np.argsort(np.asarray(scores))[::-1]
            save_outputs(
                "CAM_outputs/" + os.path.splitext(im_path)[0],
                im.transpose([1, 2, 0]) + 128.0,
                [np.asarray(c) for c in cams],
                [num_to_dog_name_map[str(b)] for b in best[:3]])

    print("CAM complete, results saved in CAM_outputs directory")
