"""Host-side (cv2) image augmentation.

Function-first design: each augmentation is a pure function over an HWC-BGR
uint8 image; ``ImageAugmenter`` is a thin config object that samples the random
parameters and composes them in the reference's order — HSV scaling, rotation,
translation, horizontal flip (behaviour matching
data_loading/image_augmentation.py:16-72 of the reference, including the uint8
round-trip and the H<=179 clip of cv2's HSV packing; the reference's deprecated
``np.random.random_integers`` translation draw becomes the equivalent
``randint(low, high+1)``).

The TPU-first path runs the same transforms on device instead
(device_augment.py); this module remains for API compatibility and as the
oracle for the on-device tests."""

import cv2
import numpy as np


def scale_hsv(im, h_scale, s_scale, v_scale):
    """Multiply the HSV channels by the given factors, clipping to valid uint8
    ranges (cv2 packs hue into [0, 179])."""
    hsv = cv2.cvtColor(im, cv2.COLOR_BGR2HSV).astype(np.float32)
    hsv *= np.array([h_scale, s_scale, v_scale], dtype=np.float32)
    np.clip(hsv, 0, 255, out=hsv)
    np.clip(hsv[:, :, 0], 0, 179, out=hsv[:, :, 0])
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)


def rotate_about_center(im, degrees):
    matrix = cv2.getRotationMatrix2D((im.shape[1] / 2, im.shape[0] / 2),
                                     degrees, 1)
    return cv2.warpAffine(im, matrix, (im.shape[1], im.shape[0]))


def translate(im, row_shift, col_shift):
    matrix = np.float32([[1, 0, row_shift], [0, 1, col_shift]])
    return cv2.warpAffine(im, matrix, dsize=(im.shape[1], im.shape[0]))


def flip_horizontal(im):
    return im[:, ::-1, :]


class ImageAugmenter:
    """Samples per-image random parameters and applies the configured subset of
    transforms. Config tuples follow the reference's conventions:
    hsv_pert_tuples = [(h_lo,h_hi),(s_lo,s_hi),(v_lo,v_hi)],
    rotation_tuple = (deg_lo, deg_hi), translation_tuple = (lo, hi),
    horizontal_flip_prob = p."""

    def __init__(self, hsv_pert_tuples=None, rotation_tuple=None,
                 horizontal_flip_prob=None, translation_tuple=None):
        self.hsv_pert_tuples = hsv_pert_tuples
        self.rotation_tuple = rotation_tuple
        self.translation_tuple = translation_tuple
        self.horizontal_flip_prob = horizontal_flip_prob

    # kept as methods so subclasses can override individual transforms
    def hsv_perturbation(self, im, pert_proportion):
        return scale_hsv(im, *pert_proportion)

    def rotate_image(self, im, rot_degrees):
        return rotate_about_center(im, rot_degrees)

    def translate_image(self, im, row_trans, col_trans):
        return translate(im, row_trans, col_trans)

    def horizontal_flip_image(self, im):
        if np.random.uniform() < self.horizontal_flip_prob:
            return flip_horizontal(im)
        return im

    def augment(self, im):
        if self.hsv_pert_tuples is not None:
            factors = [np.random.uniform(lo, hi)
                       for lo, hi in self.hsv_pert_tuples]
            im = self.hsv_perturbation(im, factors)
        if self.rotation_tuple is not None:
            im = self.rotate_image(im, np.random.uniform(*self.rotation_tuple))
        if self.translation_tuple is not None:
            lo, hi = self.translation_tuple
            im = self.translate_image(im,
                                      np.random.randint(-lo, hi + 1),
                                      np.random.randint(-lo, hi + 1))
        if self.horizontal_flip_prob is not None:
            im = self.horizontal_flip_image(im)
        return im
