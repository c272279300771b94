"""Data pipeline: directory loader thread/queue/mixup semantics, preprocessor,
on-device augmentation vs cv2 oracles."""

import os

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dorknet_tpu.data_loading import (
    ImageDataLoader, ImagePreprocessor, ImageAugmenter, epoch_image_generator,
)
from dorknet_tpu.data_loading import device_augment as da


@pytest.fixture
def image_dir(tmp_path):
    """class/images/* layout with 3 classes x 4 images (reference structure)."""
    rng = np.random.RandomState(0)
    for c in ["beagle", "corgi", "akita"]:
        d = tmp_path / c / "images"
        d.mkdir(parents=True)
        for i in range(4):
            im = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), im)
    return str(tmp_path)


def test_preprocessor_center_crop_and_shift(image_dir):
    pp = ImagePreprocessor(image_size=(32, 32), crop_mode="center")
    path = os.path.join(image_dir, "beagle", "images", "0.png")
    out = pp.load_image(path)
    assert out.shape == (3, 32, 32)
    assert out.dtype == np.float32
    # -128 shift applied
    raw = cv2.resize(cv2.imread(path), (40, 40))
    crop = raw[4:36, 4:36].astype(np.float32).transpose(2, 0, 1) - 128.0
    np.testing.assert_allclose(out, crop)


def test_preprocessor_augmenter_applied_vs_reference_noop(image_dir):
    path = os.path.join(image_dir, "corgi", "images", "1.png")
    aug = ImageAugmenter(horizontal_flip_prob=1.0)
    np.random.seed(0)
    out_fixed = ImagePreprocessor((32, 32), "center", image_augmenter=aug).load_image(path)
    np.random.seed(0)
    out_ref = ImagePreprocessor((32, 32), "center", image_augmenter=aug,
                                apply_augmenter=False).load_image(path)
    np.random.seed(0)
    out_plain = ImagePreprocessor((32, 32), "center").load_image(path)
    # fixed path flips; reference-compat path discards the augmenter result
    np.testing.assert_allclose(out_fixed, out_plain[:, :, ::-1])
    np.testing.assert_allclose(out_ref, out_plain)


def test_loader_survives_corrupt_image(image_dir):
    """A truncated/garbage image file must be zero-filled (like the native
    decoder), not kill the producer thread and hang every consumer."""
    bad = os.path.join(image_dir, "beagle", "images", "zz_bad.png")
    with open(bad, "wb") as f:
        f.write(b"not an image at all")
    pp = ImagePreprocessor(image_size=(32, 32), crop_mode="center")
    # flat (non-balanced) sampling walks every file incl. the corrupt one:
    # 13 files, batch 13 covers all
    loader = ImageDataLoader(image_dir, batch_size=13, preprocessor=pp,
                             class_balance=False)
    try:
        X, y, oh = next(loader.pull_batch(1))
        assert X.shape == (13, 3, 32, 32)
        assert np.isfinite(X).all()
    finally:
        loader.stop_thread()

    # same for the emit_hwc_uint8 (on-device augment) mode
    loader2 = ImageDataLoader(image_dir, batch_size=13, preprocessor=pp,
                              class_balance=False, emit_hwc_uint8=True)
    try:
        X2, _, _ = next(loader2.pull_batch(1))
        assert X2.dtype == np.uint8 and X2.shape[0] == 13
    finally:
        loader2.stop_thread()


def test_loader_rejects_no_dir_structure(image_dir):
    """classes_from_dir_structure=False dies silently in the reference's
    producer thread; here it is a loud constructor error."""
    pp = ImagePreprocessor(image_size=(32, 32), crop_mode="center")
    with pytest.raises(ValueError, match="classes_from_dir_structure"):
        ImageDataLoader(image_dir, batch_size=4, preprocessor=pp,
                        classes_from_dir_structure=False, start_thread=False)


def test_hsv_integer_input_no_wraparound():
    """uint8 pixels through the HSV oracles must match the float path —
    unsigned channel differences would otherwise wrap mod 256 (verified
    failure case: b=200,g=10,r=250 gave hue 8.25 instead of 156.25)."""
    px = np.array([[[200, 10, 250]]], dtype=np.uint8)  # HWC BGR
    f32 = np.asarray(da._bgr_to_hsv(jnp.asarray(px.astype(np.float32))))
    u8 = np.asarray(da._bgr_to_hsv(jnp.asarray(px)))
    np.testing.assert_allclose(u8, f32, atol=1e-4)
    chw = px.transpose(2, 0, 1)
    f32c = np.asarray(da._bgr_to_hsv_chw(jnp.asarray(chw.astype(np.float32))))
    u8c = np.asarray(da._bgr_to_hsv_chw(jnp.asarray(chw)))
    np.testing.assert_allclose(u8c, f32c, atol=1e-4)


def test_image_data_loader_basic(image_dir):
    pp = ImagePreprocessor(image_size=(32, 32), crop_mode="center")
    loader = ImageDataLoader(image_dir, batch_size=6, preprocessor=pp,
                             class_balance=True, num_workers=2)
    try:
        batches = list(loader.pull_batch(3))
        assert len(batches) == 3
        X, y, one_hot = batches[0]
        assert X.shape == (6, 3, 32, 32)
        assert one_hot.shape == (6, 3)
        # class-balanced round robin: all 3 classes appear twice in a batch of 6
        assert sorted(y) == [0, 0, 1, 1, 2, 2]
        np.testing.assert_array_equal(one_hot.argmax(1), y)
    finally:
        loader.stop_thread()


def test_image_data_loader_mixup_pairs(image_dir):
    pp = ImagePreprocessor(image_size=(32, 32), crop_mode="center")
    loader = ImageDataLoader(image_dir, batch_size=4, preprocessor=pp,
                             class_balance=False, mixup_range_tuple=(0.2, 0.2))
    try:
        (X1, y1, oh1), (X2, y2, oh2) = list(loader.pull_batch(2))
        # soft labels sum to 1
        np.testing.assert_allclose(oh1.sum(1), 1.0, rtol=1e-5)
        # With lam fixed at 0.2: X1 = 0.2*B2 + 0.8*B1 and X2 = 0.2*B1 + 0.8*B2
        # for the SAME two source batches. Invert the blend: the recovered
        # sources must be valid preprocessor outputs — integral uint8-128
        # values in [-128, 127] — which a wrong lam, unpaired batches, or
        # unblended passthrough cannot produce from both equations at once.
        B1 = (0.8 * X1 - 0.2 * X2) / 0.6
        B2 = (0.8 * X2 - 0.2 * X1) / 0.6
        for B in (B1, B2):
            assert B.min() >= -128.5 and B.max() <= 127.5
            np.testing.assert_allclose(B, np.round(B), atol=0.02)
        # recovered labels are the pure one-hots of the emitted label lists
        o1 = (0.8 * oh1 - 0.2 * oh2) / 0.6
        o2 = (0.8 * oh2 - 0.2 * oh1) / 0.6
        for o, ylist in ((o1, y1), (o2, y2)):
            np.testing.assert_allclose(o.sum(1), 1.0, atol=1e-4)
            np.testing.assert_allclose(o.max(1), 1.0, atol=1e-4)
            np.testing.assert_array_equal(o.argmax(1), np.asarray(ylist))
    finally:
        loader.stop_thread()


def test_shuffle_indices_protocol(image_dir):
    pp = ImagePreprocessor(image_size=(32, 32), crop_mode="center")
    loader = ImageDataLoader(image_dir, batch_size=4, preprocessor=pp,
                             class_balance=False)
    try:
        next(iter(loader.pull_batch(1)))
        loader.shuffle_indices()  # must not deadlock
        X, y, oh = next(iter(loader.pull_batch(1)))
        assert X.shape == (4, 3, 32, 32)
    finally:
        loader.stop_thread()


def test_loader_data_shard_disjoint_union(image_dir):
    """data_shard=(idx, count) — the multi-host per-process file shard: the
    shards are class-balanced, pairwise disjoint, their union is the full
    dataset, and labels agree across shards (assigned from the FULL
    listing)."""
    from dorknet_tpu.data_loading.image_data_loader import ImageDataLoader
    from dorknet_tpu.data_loading.image_preprocessor import ImagePreprocessor

    prep = ImagePreprocessor(image_size=(32, 32))
    full = ImageDataLoader(image_dir, 2, prep, start_thread=False)
    shards = [ImageDataLoader(image_dir, 2, prep, start_thread=False,
                              data_shard=(i, 2)) for i in range(2)]

    all_paths = {p for _, p in full.samples}
    shard_paths = [{p for _, p in s.samples} for s in shards]
    assert shard_paths[0] & shard_paths[1] == set()
    assert shard_paths[0] | shard_paths[1] == all_paths
    for s in shards:
        assert s.class_name_num_map == full.class_name_num_map
        # class-balanced to within one image (4 images/class, 2 shards -> 2)
        per_class = {}
        for n, _ in s.samples:
            per_class[n] = per_class.get(n, 0) + 1
        assert set(per_class.values()) == {2}

    # a shard can actually produce batches
    loader = ImageDataLoader(image_dir, 4, prep, data_shard=(0, 2))
    try:
        X, y, one_hot = next(loader.pull_batch(1))
        assert X.shape[0] == 4 and one_hot.shape == (4, 3)
    finally:
        loader.stop_thread()

    # over-sharding a class empties it -> loud constructor error
    with pytest.raises(ValueError, match="no images"):
        ImageDataLoader(image_dir, 2, prep, start_thread=False,
                        data_shard=(4, 5), class_balance=False)
    with pytest.raises(ValueError, match="data_shard"):
        ImageDataLoader(image_dir, 2, prep, start_thread=False,
                        data_shard=(2, 2))


def test_mnist_epoch_generator_shapes():
    X = np.random.rand(100, 784).astype(np.float32)
    y = np.random.randint(0, 10, 100)
    batches = list(epoch_image_generator(X, y, batch_size=20))
    assert len(batches) == 5
    xb, yb, oh = batches[0]
    assert xb.shape == (20, 1, 28, 28) and oh.shape == (20, 10)


# ---------------- on-device augmentation vs cv2 oracles ---------------- #

def test_device_hsv_roundtrip_matches_cv2():
    rng = np.random.RandomState(1)
    im = rng.randint(0, 255, (16, 16, 3)).astype(np.float32)
    hsv = np.asarray(da._bgr_to_hsv(jnp.asarray(im)))
    # compare against cv2's exact float conversion: H in [0,360), S,V in [0,1]
    ref_f = cv2.cvtColor(im / 255.0, cv2.COLOR_BGR2HSV)
    np.testing.assert_allclose(hsv[..., 0] * 2.0, ref_f[..., 0], atol=0.75)
    np.testing.assert_allclose(hsv[..., 1] / 255.0, ref_f[..., 1], atol=0.01)
    # V = max(B,G,R): an exact computation on both sides, so tight tolerance
    # (both operands are on the [0,1] scale here)
    np.testing.assert_allclose(hsv[..., 2] / 255.0, ref_f[..., 2],
                               rtol=1e-4, atol=1e-3)
    back = np.asarray(da._hsv_to_bgr(da._bgr_to_hsv(jnp.asarray(im))))
    np.testing.assert_allclose(back, im, atol=0.5)


def test_device_rotate_matches_cv2():
    rng = np.random.RandomState(2)
    im = rng.randint(0, 255, (32, 32, 3)).astype(np.float32)
    # fixed angle via a key that we bypass: call the resample core through a
    # deterministic rotation by monkey-binding uniform? simpler: rotate twice
    # with the full pipeline off and compare distributions. Here: compare the
    # deterministic geometry by fixing the random draw range to a point.
    out = np.asarray(da.rotate(jax.random.PRNGKey(0), jnp.asarray(im), (10.0, 10.0)))
    M = cv2.getRotationMatrix2D((im.shape[1] / 2, im.shape[0] / 2), 10.0, 1)
    ref = cv2.warpAffine(im, M, (im.shape[1], im.shape[0]))
    # interiors should agree closely (borders differ by fill convention)
    np.testing.assert_allclose(out[4:-4, 4:-4], ref[4:-4, 4:-4], atol=16.0)
    assert np.median(np.abs(out[4:-4, 4:-4] - ref[4:-4, 4:-4])) < 2.0


def test_device_train_pipeline_shapes_and_mixup():
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, (6, 40, 40, 3)).astype(np.float32)
    oh = np.eye(5, dtype=np.float32)[rng.randint(0, 5, 6)]
    X, y = da.train_pipeline(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(oh), (32, 32),
        hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
        rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
        crop_mode="random", mixup=(0.0, 0.3))
    assert X.shape == (12, 3, 32, 32)  # mixup doubles the batch
    assert y.shape == (12, 5)
    np.testing.assert_allclose(np.asarray(y).sum(1), 1.0, rtol=1e-5)
    # values are in the shifted range
    assert float(jnp.min(X)) >= -128.0 and float(jnp.max(X)) <= 127.0 + 1e-3


def test_shuffle_stress_no_deadlock(image_dir):
    """The reference's pause/restart protocol is untested hand-rolled thread
    coordination (SURVEY §5) — stress ours: repeated shuffles interleaved with
    pulls must neither deadlock nor produce malformed batches."""
    pp = ImagePreprocessor(image_size=(32, 32), crop_mode="center")
    loader = ImageDataLoader(image_dir, batch_size=4, preprocessor=pp,
                             class_balance=False, num_workers=2)
    try:
        for _ in range(5):
            X, y, oh = next(iter(loader.pull_batch(1)))
            assert X.shape == (4, 3, 32, 32)
            loader.shuffle_indices()
        X, y, oh = next(iter(loader.pull_batch(1)))
        assert np.isfinite(X).all()
    finally:
        loader.stop_thread()


def test_train_pipeline_aug_dtype_follows_policy():
    """aug_dtype=None resolves from the compute-dtype policy OUTSIDE the jit
    (fp32 under the parity default; bf16 only under set_compute_dtype) and a
    policy flip retraces rather than reusing a stale-dtype program."""
    import dorknet_tpu

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (4, 40, 40, 3), dtype=np.uint8))
    oh = jnp.asarray(np.eye(3, dtype=np.float32)[rng.randint(0, 3, 4)])
    kw = dict(hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
              rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
              crop_mode="random")
    X, _ = da.train_pipeline(jax.random.PRNGKey(0), imgs, oh, (32, 32), **kw)
    assert X.dtype == jnp.float32  # parity default
    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        Xb, _ = da.train_pipeline(jax.random.PRNGKey(0), imgs, oh, (32, 32),
                                  **kw)
        assert Xb.dtype == jnp.bfloat16  # production policy, same callable
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)
    # and an explicit aug_dtype overrides the policy
    Xf, _ = da.train_pipeline(jax.random.PRNGKey(0), imgs, oh, (32, 32),
                              aug_dtype="float32", **kw)
    assert Xf.dtype == jnp.float32


def test_back_to_back_shuffles_no_deadlock(image_dir):
    """Regression for the pause-handshake race: a second shuffle_indices
    arriving while the producer is waking from the first could be clobbered
    by the producer's resume (the old boolean flag protocol), leaving the
    second call spinning forever. The Condition+counter protocol must survive
    rapid back-to-back shuffles with no pulls in between."""
    pp = ImagePreprocessor(image_size=(32, 32), crop_mode="center")
    loader = ImageDataLoader(image_dir, batch_size=4, preprocessor=pp,
                             class_balance=False, num_workers=2)
    try:
        next(iter(loader.pull_batch(1)))  # producer warm
        for _ in range(8):
            loader.shuffle_indices()
            loader.shuffle_indices()  # immediately again — the race window
        X, y, oh = next(iter(loader.pull_batch(1)))
        assert X.shape == (4, 3, 32, 32)
    finally:
        loader.stop_thread()


def test_full_pipeline_loader_prefetch_trainer(image_dir):
    """End-to-end host pipeline: directory loader -> device_prefetch ->
    fused Trainer step (the flagship example's data path)."""
    from dorknet_tpu.data_loading import device_prefetch
    from dorknet_tpu.network import FeedForwardNetwork, Trainer
    from dorknet_tpu.layers import (ConvLayer, BatchNormLayer, ReLu,
                                    GlobalAveragePoolingLayer, DenseLayer,
                                    SoftmaxWithCrossEntropy)
    from dorknet_tpu.optimisers import SGDMomentum

    pp = ImagePreprocessor(image_size=(32, 32), crop_mode="random")
    loader = ImageDataLoader(image_dir, batch_size=4, preprocessor=pp,
                             class_balance=True, mixup_range_tuple=(0.0, 0.3))
    try:
        np.random.seed(0)
        net = FeedForwardNetwork("pipe")
        net.add_layer(ConvLayer("c", filter_block_shape=(8, 3, 3, 3),
                                with_bias=False))
        net.add_layer(BatchNormLayer("b", incoming_chans=8))
        net.add_layer(ReLu("r"))
        net.add_layer(GlobalAveragePoolingLayer("g"))
        net.add_layer(DenseLayer("d", incoming_chans=8, output_dim=3))
        net.set_loss_layer(SoftmaxWithCrossEntropy("s"))
        tr = Trainer(net, SGDMomentum(net, 0.01, 0.9))
        for X, y, one_hot in device_prefetch(loader.pull_batch(4), size=2):
            loss, preds = tr.step(np.asarray(X), np.asarray(one_hot))
            assert np.isfinite(float(loss))
    finally:
        loader.stop_thread()


def test_make_class_name_map(image_dir, tmp_path):
    from scripts.make_class_name_map import build_map

    m = build_map(image_dir)
    assert m == {"0": "akita", "1": "beagle", "2": "corgi"}


def test_on_device_augment_full_path(image_dir):
    """emit_hwc_uint8 loader -> device train_pipeline -> fused Trainer step:
    the flagship example's ON_DEVICE_AUGMENT mode end-to-end."""
    import jax
    from dorknet_tpu.data_loading.device_augment import train_pipeline
    from dorknet_tpu.network import FeedForwardNetwork, Trainer
    from dorknet_tpu.layers import (ConvLayer, BatchNormLayer, ReLu,
                                    GlobalAveragePoolingLayer, DenseLayer,
                                    SoftmaxWithCrossEntropy)
    from dorknet_tpu.optimisers import SGDMomentum

    pp = ImagePreprocessor(image_size=(24, 24), crop_mode="random")
    loader = ImageDataLoader(image_dir, batch_size=4, preprocessor=pp,
                             class_balance=True, emit_hwc_uint8=True)
    try:
        np.random.seed(0)
        net = FeedForwardNetwork("oda")
        net.add_layer(ConvLayer("c", filter_block_shape=(8, 3, 3, 3), with_bias=False))
        net.add_layer(BatchNormLayer("b", incoming_chans=8))
        net.add_layer(ReLu("r"))
        net.add_layer(GlobalAveragePoolingLayer("g"))
        net.add_layer(DenseLayer("d", incoming_chans=8, output_dim=3))
        net.set_loss_layer(SoftmaxWithCrossEntropy("s"))
        tr = Trainer(net, SGDMomentum(net, 0.01, 0.9))
        key = jax.random.PRNGKey(0)
        for X_u8, y, one_hot in loader.pull_batch(3):
            assert X_u8.dtype == np.uint8
            assert X_u8.shape == (4, 30, 30, 3)  # precrop = 1.25 * 24
            key, k = jax.random.split(key)
            Xd, yd = train_pipeline(
                k, jnp.asarray(X_u8, jnp.float32), jnp.asarray(one_hot), (24, 24),
                hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
                rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
                crop_mode="random", mixup=(0.0, 0.3))
            assert Xd.shape == (8, 3, 24, 24)  # mixup doubled
            loss, preds = tr.step(Xd, yd)
            assert np.isfinite(float(loss))
    finally:
        loader.stop_thread()


def test_device_augment_key_determinism():
    import jax
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (4, 40, 40, 3)).astype(np.float32))
    oh = jnp.asarray(np.eye(3, dtype=np.float32)[rng.randint(0, 3, 4)])
    kw = dict(hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
              rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
              crop_mode="random", mixup=(0.0, 0.3))
    a1 = da.train_pipeline(jax.random.PRNGKey(7), imgs, oh, (32, 32), **kw)
    a2 = da.train_pipeline(jax.random.PRNGKey(7), imgs, oh, (32, 32), **kw)
    b = da.train_pipeline(jax.random.PRNGKey(8), imgs, oh, (32, 32), **kw)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    assert not np.array_equal(np.asarray(a1[0]), np.asarray(b[0]))


def test_rotate_shear_matches_gather_geometry():
    """Shear rotation (fast path) is geometrically exact vs the gather oracle
    on smooth images (noise differences are interpolation blur only)."""
    yy, xx = np.mgrid[0:48, 0:48]
    im = jnp.asarray(np.stack([xx * 2.0, yy * 2.0, (xx + yy) * 1.0], -1)
                     .astype(np.float32))
    for deg in (7.0, -12.0):
        a = np.asarray(da.rotate(jax.random.PRNGKey(0), im, (deg, deg)))
        b = np.asarray(da.rotate_shear(jax.random.PRNGKey(0), im, (deg, deg)))
        inner = (slice(10, -10),) * 2
        assert np.median(np.abs(a[inner] - b[inner])) < 0.05


def test_train_pipeline_chw_variant():
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, (4, 40, 40, 3)).astype(np.float32)
    oh = np.eye(5, dtype=np.float32)[rng.randint(0, 5, 4)]
    X, y = da.train_pipeline(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(oh), (32, 32),
        hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
        rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
        crop_mode="random", mixup=(0.0, 0.3), internal_layout="CHW")
    assert X.shape == (8, 3, 32, 32)
    assert float(jnp.min(X)) >= -128.0 and float(jnp.max(X)) <= 127.0 + 1e-3


# ------------- batched planes path vs the per-image oracles ------------- #

def _planes(imgs_hwc):
    return jnp.transpose(jnp.asarray(imgs_hwc), (0, 3, 1, 2))


def test_batched_crop_matches_numpy_slices():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (5, 40, 44, 3)).astype(np.float32)
    r = np.array([0, 3, 7, 2, 5], np.int32)
    c = np.array([11, 0, 4, 9, 1], np.int32)
    out = np.asarray(da.crop_batch_planes(_planes(imgs), jnp.asarray(r),
                                          jnp.asarray(c), (32, 32)))
    for i in range(5):
        ref = imgs[i, r[i]:r[i] + 32, c[i]:c[i] + 32, :].transpose(2, 0, 1)
        np.testing.assert_array_equal(out[i], ref)


def test_batched_hsv_matches_hwc_oracle():
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (4, 24, 24, 3)).astype(np.float32)
    scales = np.array([[1.05, 0.7, 1.6], [0.92, 1.9, 0.55],
                       [1.0, 1.0, 1.0], [1.1, 0.5, 2.0]], np.float32)
    out = np.asarray(da.hsv_batch_planes(_planes(imgs), jnp.asarray(scales)))
    for i in range(4):
        # fixed-scale tuples make the HWC oracle deterministic
        tuples = tuple((float(s), float(s)) for s in scales[i])
        ref = np.asarray(da.hsv_perturb(jax.random.PRNGKey(0),
                                        jnp.asarray(imgs[i]), tuples))
        np.testing.assert_allclose(out[i].transpose(1, 2, 0), ref, atol=1e-2)


def test_batched_rotate_production_size_vs_oracles():
    """225px / ±15° (the flagship config). The three-shear family deviates
    from a single-gather warpAffine in a thin band along the rotated frame
    edge (per-shear zero-fill lerps anti-alias the boundary differently —
    see rotate_batch_planes docstring); pin that the batched planes version
    (a) agrees with the per-image rotate_shear on 99%+ of the frame with a
    tiny p99, (b) deviates from the cv2-matched gather oracle on <1% of
    pixels with p99 < 0.1, and (c) is AT LEAST as faithful to the gather
    oracle as the established per-image shear path (it is strictly better:
    rotate_shear clips the last content column; planes reproduces it)."""
    yy, xx = np.mgrid[0:225, 0:225]
    im = np.stack([xx * 1.0, yy * 1.0, (xx + yy) * 0.5], -1).astype(np.float32)
    imgs = np.stack([im, im[::-1].copy()])
    degs = np.array([15.0, -9.0], np.float32)
    out = np.asarray(da.rotate_batch_planes(_planes(imgs), jnp.asarray(degs),
                                            (-15.0, 15.0)))
    for i in range(2):
        got = out[i].transpose(1, 2, 0)
        shear = np.asarray(da.rotate_shear(
            jax.random.PRNGKey(0), jnp.asarray(imgs[i]),
            (float(degs[i]), float(degs[i]))))
        d_shear = np.abs(got - shear)
        assert np.percentile(d_shear, 99) < 1e-3, np.percentile(d_shear, 99)
        assert (d_shear.max(-1) > 0.1).mean() < 0.01

        gather = np.asarray(da.rotate(
            jax.random.PRNGKey(0), jnp.asarray(imgs[i]),
            (float(degs[i]), float(degs[i]))))
        d_ours = np.abs(got - gather)
        d_theirs = np.abs(shear - gather)
        assert np.percentile(d_ours, 99) < 0.1, np.percentile(d_ours, 99)
        assert (d_ours.max(-1) > 5).mean() < 0.01, (d_ours.max(-1) > 5).mean()
        assert (d_ours.max(-1) > 5).sum() <= (d_theirs.max(-1) > 5).sum()


def test_batched_rotate_matches_gather_oracle():
    yy, xx = np.mgrid[0:48, 0:48]
    im = np.stack([xx * 2.0, yy * 2.0, (xx + yy) * 1.0], -1).astype(np.float32)
    imgs = np.stack([im, im[::-1].copy()])
    degs = np.array([9.0, -13.0], np.float32)
    out = np.asarray(da.rotate_batch_planes(_planes(imgs), jnp.asarray(degs),
                                            (-15.0, 15.0)))
    for i in range(2):
        ref = np.asarray(da.rotate(jax.random.PRNGKey(0), jnp.asarray(imgs[i]),
                                   (float(degs[i]), float(degs[i]))))
        inner = (slice(10, -10), slice(10, -10))
        diff = np.abs(out[i].transpose(1, 2, 0)[inner] - ref[inner])
        assert np.median(diff) < 0.05, np.median(diff)


def test_batched_flip():
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 255, (3, 8, 8, 3)).astype(np.float32)
    out = np.asarray(da.flip_batch_planes(
        _planes(imgs), jnp.asarray([True, False, True])))
    np.testing.assert_array_equal(out[0], imgs[0, :, ::-1].transpose(2, 0, 1))
    np.testing.assert_array_equal(out[1], imgs[1].transpose(2, 0, 1))
    np.testing.assert_array_equal(out[2], imgs[2, :, ::-1].transpose(2, 0, 1))


def test_train_pipeline_planes_default_full_stack():
    """The default (planes) pipeline: shape/range contract, determinism, and
    agreement with the vmapped HWC path's output DISTRIBUTION contract
    (same static config, both produce valid -128-shifted crops)."""
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, (6, 40, 40, 3)).astype(np.float32)
    oh = np.eye(5, dtype=np.float32)[rng.randint(0, 5, 6)]
    kw = dict(hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
              rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
              crop_mode="random", mixup=(0.0, 0.3))
    X, y = da.train_pipeline(jax.random.PRNGKey(0), jnp.asarray(imgs),
                             jnp.asarray(oh), (32, 32), **kw)
    assert X.shape == (12, 3, 32, 32) and y.shape == (12, 5)
    assert float(jnp.min(X)) >= -128.0 and float(jnp.max(X)) <= 127.0 + 1e-3
    np.testing.assert_allclose(np.asarray(y).sum(1), 1.0, atol=1e-5)
    X2, _ = da.train_pipeline(jax.random.PRNGKey(0), jnp.asarray(imgs),
                              jnp.asarray(oh), (32, 32), **kw)
    np.testing.assert_array_equal(np.asarray(X), np.asarray(X2))
    # NHWC output pairing
    Xn, _ = da.train_pipeline(jax.random.PRNGKey(0), jnp.asarray(imgs),
                              jnp.asarray(oh), (32, 32),
                              output_layout="NHWC", **kw)
    np.testing.assert_array_equal(np.asarray(Xn),
                                  np.asarray(X).transpose(0, 2, 3, 1))


def test_loader_rejects_empty_dataset_and_empty_class(tmp_path):
    """Construction-time guard: empty datasets / empty classes used to make
    the producer thread spin forever on StopIteration while pull_batch hung."""
    import pytest
    from dorknet_tpu.data_loading import ImageDataLoader, ImagePreprocessor

    pp = ImagePreprocessor((8, 8))
    empty = tmp_path / "empty"
    (empty / "classA" / "images").mkdir(parents=True)
    with pytest.raises(ValueError, match="no images found"):
        ImageDataLoader(str(empty), 4, pp, start_thread=False)

    import cv2
    import numpy as np
    mixed = tmp_path / "mixed"
    (mixed / "classA" / "images").mkdir(parents=True)
    (mixed / "classB" / "images").mkdir(parents=True)
    cv2.imwrite(str(mixed / "classA" / "images" / "a.jpg"),
                np.zeros((8, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="no images"):
        ImageDataLoader(str(mixed), 4, pp, class_balance=True,
                        start_thread=False)
    # flat mode tolerates the empty class (samples exist)
    l = ImageDataLoader(str(mixed), 4, pp, class_balance=False,
                        start_thread=False)
    assert len(l.samples) == 1


def test_stack_batches_groups_and_drops_tail():
    """stack_batches: k consecutive (X, y, oh) batches -> one stacked tuple;
    a short tail is dropped (ragged stacks would compile a one-off scan)."""
    from dorknet_tpu.data_loading import stack_batches

    batches = [(np.full((2, 3), i, np.float32), np.array([i, i]),
                np.eye(3, dtype=np.float32)[[i % 3, i % 3]])
               for i in range(7)]
    out = list(stack_batches(iter(batches), 3))
    assert len(out) == 2  # 7 batches -> two groups of 3, tail of 1 dropped
    Xs, ys, ohs = out[0]
    assert Xs.shape == (3, 2, 3) and ys.shape == (3, 2) and ohs.shape == (3, 2, 3)
    assert Xs[1, 0, 0] == 1.0 and out[1][0][0, 0, 0] == 3.0


def test_stack_batches_feeds_multi_step_augmented():
    """The stacking helper drives the one-dispatch-per-K fused trainer."""
    import jax

    from dorknet_tpu.data_loading import stack_batches
    from dorknet_tpu.layers import (BatchNormLayer, ConvLayer, DenseLayer,
                                    GlobalAveragePoolingLayer, ReLu,
                                    SoftmaxWithCrossEntropy)
    from dorknet_tpu.network import FeedForwardNetwork, Trainer
    from dorknet_tpu.optimisers import SGDMomentum

    np.random.seed(3)
    net = FeedForwardNetwork("stacked")
    net.add_layer(ConvLayer("c", filter_block_shape=(8, 3, 3, 3),
                            with_bias=False))
    net.add_layer(BatchNormLayer("b", incoming_chans=8))
    net.add_layer(ReLu("r"))
    net.add_layer(GlobalAveragePoolingLayer("g"))
    net.add_layer(DenseLayer("d", incoming_chans=8, output_dim=3))
    net.set_loss_layer(SoftmaxWithCrossEntropy("s"))
    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))

    rng = np.random.RandomState(0)
    batches = [(rng.randint(0, 255, (4, 30, 30, 3), dtype=np.uint8),
                None, np.eye(3, dtype=np.float32)[rng.randint(0, 3, 4)])
               for _ in range(4)]
    K = 2
    key = jax.random.PRNGKey(0)
    for Xs, _, ohs in stack_batches(iter(batches), K):
        key, k = jax.random.split(key)
        losses, preds = tr.multi_step_augmented(
            jax.random.split(k, K), Xs, ohs, (24, 24), mixup=(0.0, 0.3),
            rotation_tuple=(-10.0, 10.0))
        assert losses.shape == (K,) and np.isfinite(np.asarray(losses)).all()


def test_stack_batches_composes_with_device_prefetch():
    """Batches already on device (out of device_prefetch) stack ON DEVICE —
    fetching them back through the host link would defeat the prefetch."""
    import jax

    from dorknet_tpu.data_loading import device_prefetch, stack_batches

    batches = [(np.full((2, 4), i, np.float32), None,
                np.eye(2, dtype=np.float32)[[i % 2, i % 2]])
               for i in range(4)]
    out = list(stack_batches(device_prefetch(iter(batches), size=2), 2))
    assert len(out) == 2
    Xs, _, ohs = out[0]
    assert isinstance(Xs, jax.Array) and Xs.shape == (2, 2, 4)
    assert isinstance(ohs, jax.Array)
    np.testing.assert_array_equal(np.asarray(Xs[1]), batches[1][0])
