"""Host-side image preprocessing as composable functions, with a thin
``ImagePreprocessor`` shell for API parity with the reference
(data_loading/image_preprocessor.py:4-47).

The numerics contract (pinned by tests/test_data_loading.py and the native
loader's golden test): resize to a 1.25x precrop, random/center crop to
``image_size``, optional host augmentation, then BGR HWC uint8 → CHW float32
with a ``-128.0`` mean shift.

One deliberate divergence (SURVEY §7.5): the reference DISCARDS the
augmenter's return value (``self.image_augmenter.augment(im)`` at :33-34),
silently making augmentation a no-op. That is plainly a bug — we keep the
result. Construct with ``apply_augmenter=False`` to reproduce the reference's
shipped (no-op) behaviour bit-for-bit.
"""

import cv2
import numpy as np


def default_precrop(image_size):
    """The reference's 1.25x pre-crop canvas for a given output size."""
    return (int(image_size[0] * 1.25), int(image_size[1] * 1.25))


def crop_origin(canvas_shape, out_size, mode):
    """Top-left (row, col) of the crop window on a resized canvas.

    ``random`` draws from np.random (excluding the bottom/right-flush
    positions, matching the reference's exclusive randint bounds :22-25);
    ``center`` floors the midpoint. ``out_size`` indexes as the reference
    does — element 0 against rows, element 1 against cols."""
    if mode == "random":
        return (np.random.randint(0, canvas_shape[0] - out_size[0]),
                np.random.randint(0, canvas_shape[1] - out_size[1]))
    return ((canvas_shape[0] - out_size[0]) // 2,
            (canvas_shape[1] - out_size[1]) // 2)


def resize_and_crop(im, image_size, crop_mode, precrop_size):
    """Resize onto the precrop canvas and cut the crop window, or plain
    resize when no crop mode is set."""
    if crop_mode not in ("random", "center"):
        return cv2.resize(im, image_size)
    canvas = cv2.resize(im, precrop_size)
    r, c = crop_origin(canvas.shape, image_size, crop_mode)
    return canvas[r:r + image_size[0], c:c + image_size[1], :]


def to_network_layout(im):
    """HWC BGR (uint8) → CHW float32 with the -128 mean shift — the input
    contract every model in the framework trains against."""
    return im.transpose(2, 0, 1).astype(np.float32) - 128.0


def preprocess(im, image_size, crop_mode=None, precrop_size=None,
               augmenter=None, apply_augmenter=True):
    """Full host pipeline for one decoded HWC BGR image."""
    im = resize_and_crop(im, image_size, crop_mode,
                         precrop_size or default_precrop(image_size))
    if augmenter is not None:
        augmented = augmenter.augment(im)
        if apply_augmenter:
            im = augmented
    return to_network_layout(im)


def preprocess_canvas(im, image_size, crop_mode=None, augmenter=None,
                      apply_augmenter=True):
    """``preprocess`` for an image that is ALREADY a precrop-resized canvas
    (the packed-dataset row format, data_loading/packed_dataset.py): the
    resize-to-precrop step is skipped, so crop-mode batches are bit-identical
    to the live-JPEG cv2 path's. With no crop mode the canvas is resized
    straight to ``image_size`` — a two-stage resize (source→precrop at pack
    time, precrop→image_size here), deliberately not bit-identical to the
    JPEG path's single source→image_size resize."""
    if crop_mode in ("random", "center"):
        r, c = crop_origin(im.shape, image_size, crop_mode)
        im = im[r:r + image_size[0], c:c + image_size[1], :]
    else:
        im = cv2.resize(np.ascontiguousarray(im), image_size)
    if augmenter is not None:
        augmented = augmenter.augment(np.ascontiguousarray(im))
        if apply_augmenter:
            im = augmented
    return to_network_layout(im)


class ImagePreprocessor:
    """Configured preprocessing pipeline; the attributes are public — the
    data loader reads ``precrop_size``/``image_size``/``crop_mode`` to drive
    the native decoder and the on-device augmentation mode."""

    def __init__(self, image_size, crop_mode=None, precrop_size=None,
                 image_augmenter=None, apply_augmenter=True):
        self.image_size = image_size  # (width, height)
        self.crop_mode = crop_mode
        self.precrop_size = precrop_size or default_precrop(image_size)
        self.image_augmenter = image_augmenter
        self.apply_augmenter = apply_augmenter

    def preprocess_image(self, im):
        return preprocess(im, self.image_size, self.crop_mode,
                          self.precrop_size, self.image_augmenter,
                          self.apply_augmenter)

    def load_image(self, image_path):
        return self.preprocess_image(cv2.imread(image_path))
