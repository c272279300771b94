"""Packed pre-decoded dataset: pack format, loader auto-detection, and the
seed-equality contract — a packed loader must draw bit-identical batches to
the live-JPEG loader under the same RNG seed (the decode-once path may not
change training semantics, only remove the per-epoch decode cost)."""

import json
import os

import cv2
import numpy as np
import pytest

from dorknet_tpu.data_loading import ImageDataLoader, ImagePreprocessor
from dorknet_tpu.data_loading.image_augmentation import ImageAugmenter
from dorknet_tpu.data_loading.packed_dataset import (
    PACKED_META, PackedDataset, is_packed_dir, write_packed_dataset)


@pytest.fixture
def image_tree(tmp_path):
    """class/images/* layout, sources at assorted sizes (pack must resize)."""
    rng = np.random.RandomState(7)
    src = tmp_path / "src"
    for c, size in [("beagle", 48), ("corgi", 64), ("akita", 56)]:
        d = src / c / "images"
        d.mkdir(parents=True)
        for i in range(4):
            im = rng.randint(0, 255, (size, size + 8, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), im)
    return str(src)


@pytest.fixture
def packed_dir(image_tree, tmp_path):
    out = str(tmp_path / "packed")
    n = write_packed_dataset(image_tree, out, (40, 40), num_workers=2)
    assert n == 12
    return out


def _pull(loader, n):
    try:
        return [(X.copy(), list(y), oh.copy())
                for X, y, oh in loader.pull_batch(n)]
    finally:
        loader.stop_thread()


def test_pack_writes_cv2_canvases(image_tree, packed_dir):
    assert is_packed_dir(packed_dir)
    assert not is_packed_dir(image_tree)
    ds = PackedDataset(packed_dir)
    assert len(ds) == 12
    assert ds.images.shape == (12, 40, 40, 3)
    assert ds.images.dtype == np.uint8
    assert ds.class_names == ["akita", "beagle", "corgi"]
    # rows are the exact cv2 precrop canvases, in discover_dataset order
    for row, path in enumerate(ds.paths):
        want = cv2.resize(cv2.imread(path), (40, 40))
        np.testing.assert_array_equal(ds.images[row], want)
        cls = os.path.basename(os.path.dirname(os.path.dirname(path)))
        assert ds.class_names[int(ds.labels[row])] == cls
    # gather returns a writable copy, not a view of the mmap
    g = ds.gather([0, 5])
    assert g.shape == (2, 40, 40, 3)
    g[:] = 0
    assert ds.images[0].any() or ds.images[5].any()


@pytest.mark.parametrize("crop_mode,balance,mixup", [
    ("center", True, None),
    ("random", False, None),
    ("random", True, (0.1, 0.4)),
])
def test_packed_loader_matches_jpeg_loader(image_tree, packed_dir,
                                           crop_mode, balance, mixup):
    """Same seed, same batches — decode path swapped, sampling untouched.
    num_workers=1 pins the per-image np.random draw order (random crops)."""
    def batches(folder):
        np.random.seed(123)
        pp = ImagePreprocessor(image_size=(32, 32), crop_mode=crop_mode)
        loader = ImageDataLoader(folder, batch_size=6, preprocessor=pp,
                                 class_balance=balance, num_workers=1,
                                 mixup_range_tuple=mixup)
        return _pull(loader, 4)

    ref = batches(image_tree)
    packed = batches(packed_dir)
    for (Xr, yr, ohr), (Xp, yp, ohp) in zip(ref, packed):
        np.testing.assert_array_equal(Xp, Xr)
        assert yp == yr
        np.testing.assert_array_equal(ohp, ohr)


def test_packed_loader_augmenter_matches(image_tree, packed_dir):
    def batches(folder):
        np.random.seed(5)
        aug = ImageAugmenter(horizontal_flip_prob=1.0)
        pp = ImagePreprocessor(image_size=(32, 32), crop_mode="center",
                               image_augmenter=aug)
        loader = ImageDataLoader(folder, batch_size=6, preprocessor=pp,
                                 num_workers=1)
        return _pull(loader, 2)

    for (Xr, _, _), (Xp, _, _) in zip(batches(image_tree),
                                      batches(packed_dir)):
        np.testing.assert_array_equal(Xp, Xr)


def test_packed_emit_hwc_uint8_is_the_canvas(image_tree, packed_dir):
    """On-device-augmentation mode: packed rows ARE the precrop canvases the
    JPEG loader would decode+resize to — gather only, zero host decode."""
    def batches(folder):
        np.random.seed(9)
        pp = ImagePreprocessor(image_size=(32, 32), crop_mode="random")
        loader = ImageDataLoader(folder, batch_size=6, preprocessor=pp,
                                 emit_hwc_uint8=True, num_workers=1)
        return _pull(loader, 3)

    for (Xr, yr, _), (Xp, yp, _) in zip(batches(image_tree),
                                        batches(packed_dir)):
        assert Xp.dtype == np.uint8 and Xp.shape == (6, 40, 40, 3)
        np.testing.assert_array_equal(Xp, Xr)
        assert yp == yr


def test_packed_data_shard_matches(image_tree, packed_dir):
    """Multi-host striding draws the same per-shard sequence in both modes."""
    for shard in [(0, 2), (1, 2)]:
        def batches(folder):
            np.random.seed(3)
            pp = ImagePreprocessor(image_size=(32, 32), crop_mode="center")
            loader = ImageDataLoader(folder, batch_size=6, preprocessor=pp,
                                     num_workers=1, data_shard=shard)
            return _pull(loader, 2)

        for (Xr, yr, _), (Xp, yp, _) in zip(batches(image_tree),
                                            batches(packed_dir)):
            np.testing.assert_array_equal(Xp, Xr)
            assert yp == yr


def test_packed_precrop_mismatch_raises(packed_dir):
    pp = ImagePreprocessor(image_size=(64, 64), crop_mode="center")  # wants 80
    with pytest.raises(ValueError, match="repack"):
        ImageDataLoader(packed_dir, batch_size=4, preprocessor=pp,
                        start_thread=False)


def test_packed_rejects_wrong_format(tmp_path):
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / PACKED_META).write_text(json.dumps({"format": "other"}))
    with pytest.raises(ValueError, match="format"):
        PackedDataset(str(bad))


def test_pack_cli(image_tree, tmp_path):
    from scripts.pack_dataset import main
    out = str(tmp_path / "cli_packed")
    main([image_tree, out, "--image-size", "32", "--workers", "2"])
    ds = PackedDataset(out)
    assert ds.precrop == (40, 40)
    assert len(ds) == 12
