"""Host-side (cv2) image augmentation, behaviour-matching the reference
ImageAugmenter (data_loading/image_augmentation.py:4-73): HSV channel scaling
with uint8/hue clipping, rotation about the centre, integer translation
(reference used the deprecated np.random.random_integers — same distribution
via randint(low, high+1)), horizontal flip with probability.

The TPU-first path runs these on device instead (see device_augment.py); this
class is kept for API compatibility and as the oracle for the on-device tests."""

import cv2
import numpy as np


class ImageAugmenter:
    def __init__(self, hsv_pert_tuples=None, rotation_tuple=None,
                 horizontal_flip_prob=None, translation_tuple=None):
        self.hsv_pert_tuples = hsv_pert_tuples
        self.rotation_tuple = rotation_tuple
        self.translation_tuple = translation_tuple
        self.horizontal_flip_prob = horizontal_flip_prob

    def augment(self, im):
        if self.hsv_pert_tuples is not None:
            hue_pert = np.random.uniform(*self.hsv_pert_tuples[0])
            sat_pert = np.random.uniform(*self.hsv_pert_tuples[1])
            val_pert = np.random.uniform(*self.hsv_pert_tuples[2])
            im = self.hsv_perturbation(im, [hue_pert, sat_pert, val_pert])
        if self.rotation_tuple is not None:
            rot_degrees = np.random.uniform(*self.rotation_tuple)
            im = self.rotate_image(im, rot_degrees)
        if self.translation_tuple is not None:
            row_trans = np.random.randint(-1 * self.translation_tuple[0],
                                          self.translation_tuple[1] + 1)
            col_trans = np.random.randint(-1 * self.translation_tuple[0],
                                          self.translation_tuple[1] + 1)
            im = self.translate_image(im, row_trans, col_trans)
        if self.horizontal_flip_prob is not None:
            im = self.horizontal_flip_image(im)
        return im

    def hsv_perturbation(self, im, pert_proportion):
        hsv = cv2.cvtColor(im, cv2.COLOR_BGR2HSV).astype(np.float32)
        hsv[:, :, 0] *= pert_proportion[0]
        hsv[:, :, 1] *= pert_proportion[1]
        hsv[:, :, 2] *= pert_proportion[2]
        np.clip(hsv, 0, 255, out=hsv)
        np.clip(hsv[:, :, 0], 0, 179, out=hsv[:, :, 0])
        return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2BGR)

    def translate_image(self, im, row_trans, col_trans):
        M = np.float32([[1, 0, row_trans], [0, 1, col_trans]])
        return cv2.warpAffine(im, M, dsize=(im.shape[1], im.shape[0]))

    def rotate_image(self, im, rot_degrees):
        M = cv2.getRotationMatrix2D((im.shape[1] / 2, im.shape[0] / 2),
                                    rot_degrees, 1)
        return cv2.warpAffine(im, M, (im.shape[1], im.shape[0]))

    def horizontal_flip_image(self, im):
        if np.random.uniform() < self.horizontal_flip_prob:
            im = im[:, ::-1, :]
        return im
