"""HBM-resident dataset (data_loading/device_dataset.py) +
Trainer.step_augmented_indexed: the packed dataset uploaded once, per-step
host->device traffic reduced to (B,) int32 indices, gather/one-hot fused
into the train-step program. The TPU-native inversion of the reference's
keep-the-device-fed producer thread (reference
data_loading/image_data_loader.py:88-117) for datasets that fit in HBM."""

import numpy as np
import pytest

import cv2
import jax
import jax.numpy as jnp

from dorknet_tpu.data_loading import (DeviceResidentDataset, ImageDataLoader,
                                      ImagePreprocessor, fits_in_hbm)
from dorknet_tpu.data_loading.packed_dataset import write_packed_dataset
from dorknet_tpu.layers import (BatchNormLayer, ConvLayer, DenseLayer,
                                GlobalAveragePoolingLayer, ReLu,
                                SoftmaxWithCrossEntropy)
from dorknet_tpu.network import FeedForwardNetwork, Trainer
from dorknet_tpu.optimisers import SGDMomentum

AUG = dict(hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
           rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
           crop_mode="random", mixup=(0.0, 0.3))
OUT = (24, 24)
PRECROP = 30  # (h, w) of the packed canvases below


@pytest.fixture
def packed_dir(tmp_path):
    rng = np.random.RandomState(7)
    src = tmp_path / "src"
    for c in ("beagle", "corgi", "akita"):
        d = src / c / "images"
        d.mkdir(parents=True)
        for i in range(4):
            im = rng.randint(0, 255, (48, 56, 3), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), im)
    out = str(tmp_path / "packed")
    n = write_packed_dataset(str(src), out, (PRECROP, PRECROP))
    assert n == 12
    return out


def build_net(name):
    np.random.seed(7)
    net = FeedForwardNetwork(name)
    net.add_layer(ConvLayer("conv0", filter_block_shape=(8, 3, 3, 3),
                            with_bias=False))
    net.add_layer(BatchNormLayer("bn0", incoming_chans=8))
    net.add_layer(ReLu("relu0"))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("dense1", incoming_chans=8, output_dim=3))
    net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))
    return net


def test_upload_reassembles_packed_arrays(packed_dir):
    """Chunked device_put (forced multi-chunk) reproduces images.npy and
    labels.npy exactly."""
    dd = DeviceResidentDataset(packed_dir, batch_size=4,
                               chunk_bytes=5 * PRECROP * PRECROP * 3)
    assert len(dd) == 12 and dd.num_classes == 3
    np.testing.assert_array_equal(np.asarray(dd.images), dd.packed.images)
    np.testing.assert_array_equal(np.asarray(dd.labels), dd.packed.labels)
    assert dd.images.dtype == jnp.uint8 and dd.labels.dtype == jnp.int32


def test_index_sampler_matches_streaming_loader(packed_dir):
    """Under the same numpy RNG state, next_indices() draws the SAME rows
    (class-balanced and flat modes) as an ImageDataLoader over the packed
    dir gathers — the protocol is delegated, not re-implemented."""
    pp = ImagePreprocessor((OUT[0], OUT[1]), crop_mode="random",
                           precrop_size=(PRECROP, PRECROP))
    for balance in (True, False):
        np.random.seed(3)
        dd = DeviceResidentDataset(packed_dir, batch_size=4,
                                   class_balance=balance)
        idx_batches = [dd.next_indices() for _ in range(6)]

        np.random.seed(3)
        loader = ImageDataLoader(packed_dir, batch_size=4, preprocessor=pp,
                                 class_balance=balance, emit_hwc_uint8=True,
                                 start_thread=False)
        for idx in idx_batches:
            paths, labels = loader.get_batch_list(balance)
            rows = [dd._row_of[p] for p in paths]
            np.testing.assert_array_equal(idx, rows)
            np.testing.assert_array_equal(dd.packed.labels[idx], labels)


def test_flat_epoch_covers_every_row(packed_dir):
    """class_balance=False mode walks the full index cycle: 3 batches of 4
    cover all 12 rows exactly once, and shuffle_indices() reshuffles."""
    dd = DeviceResidentDataset(packed_dir, batch_size=4, class_balance=False)
    seen = np.concatenate([dd.next_indices() for _ in range(3)])
    np.testing.assert_array_equal(np.sort(seen), np.arange(12))
    np.random.seed(11)
    dd.shuffle_indices()
    seen2 = np.concatenate([dd.next_indices() for _ in range(3)])
    np.testing.assert_array_equal(np.sort(seen2), np.arange(12))


def test_data_shard_striding(packed_dir):
    """data_shard splits per class, disjoint with union = full dataset."""
    dds = [DeviceResidentDataset(packed_dir, batch_size=2,
                                 class_balance=False, data_shard=(i, 2))
           for i in range(2)]
    rows = [set(np.concatenate([d.next_indices() for _ in range(3)]))
            for d in dds]
    assert rows[0].isdisjoint(rows[1])
    assert rows[0] | rows[1] == set(range(12))


@pytest.mark.slow
def test_step_augmented_indexed_equals_direct(packed_dir):
    """Same key, same rows: the indexed fused step == step_augmented on the
    host-gathered batch — losses, preds, and the full param trajectory."""
    dd = DeviceResidentDataset(packed_dir, batch_size=6, class_balance=False)
    net_a, net_b = build_net("idx"), build_net("direct")
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.05, 0.9))

    key = jax.random.PRNGKey(3)
    for _ in range(3):
        key, k = jax.random.split(key)
        rows = dd.next_indices()
        loss_a, preds_a = tr_a.step_augmented_indexed(
            k, dd.images, dd.labels, rows, OUT, dd.num_classes, **AUG)
        X = dd.packed.gather(rows)
        oh = np.eye(dd.num_classes,
                    dtype=np.float32)[dd.packed.labels[rows]]
        loss_b, preds_b = tr_b.step_augmented(k, X, oh, OUT, **AUG)
        assert np.allclose(float(loss_a), float(loss_b), rtol=1e-5,
                           atol=1e-6)
        np.testing.assert_array_equal(np.asarray(preds_a),
                                      np.asarray(preds_b))

    pa = jax.tree_util.tree_leaves([l.get_params() for l in net_a.layers])
    pb = jax.tree_util.tree_leaves([l.get_params() for l in net_b.layers])
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_indexed_training_learns(packed_dir):
    """End-to-end sanity: a few indexed epochs reduce the loss (channel-
    intensity class signal injected into the packed rows so the task
    survives GlobalAveragePooling)."""
    dd = DeviceResidentDataset(packed_dir, batch_size=6)
    # overwrite the device copy with a learnable task: class k brightens
    # channel k (keep uint8 range)
    imgs = np.asarray(dd.images).astype(np.int32)
    labels = np.asarray(dd.labels)
    for i, lab in enumerate(labels):
        imgs[i, :, :, int(lab)] += 90
    dd.images = jnp.asarray(np.clip(imgs, 0, 255).astype(np.uint8))

    net = build_net("learn")
    tr = Trainer(net, SGDMomentum(net, 0.05, 0.9))
    key = jax.random.PRNGKey(0)
    aug = dict(AUG, mixup=None, hsv_pert_tuples=None)
    losses = []
    for _ in range(12):
        key, k = jax.random.split(key)
        loss, _ = tr.step_augmented_indexed(
            k, dd.images, dd.labels, dd.next_indices(), OUT,
            dd.num_classes, **aug)
        losses.append(float(loss))
    assert np.mean(losses[-3:]) < np.mean(losses[:3]) * 0.8


def test_multi_step_augmented_indexed_equals_sequential(packed_dir):
    """One K-step scan dispatch over (K, B) index stacks == K sequential
    indexed steps (post-BN-init; the fresh-net call exercises the
    single-step fallback), including the param trajectory."""
    K = 3
    dd = DeviceResidentDataset(packed_dir, batch_size=4, class_balance=False)
    net_a, net_b = build_net("mk-idx"), build_net("seq-idx")
    tr_a = Trainer(net_a, SGDMomentum(net_a, 0.05, 0.9))
    tr_b = Trainer(net_b, SGDMomentum(net_b, 0.05, 0.9))

    np.random.seed(5)
    rows0 = np.stack([dd.next_indices() for _ in range(K)])
    keys0 = jax.random.split(jax.random.PRNGKey(11), K)
    # fresh-net call: BN uninitialised -> K-single-step fallback
    losses_a, preds_a = tr_a.multi_step_augmented_indexed(
        keys0, dd.images, dd.labels, rows0, OUT, dd.num_classes, **AUG)
    assert losses_a.shape == (K,)
    for i in range(K):
        li, _ = tr_b.step_augmented_indexed(
            keys0[i], dd.images, dd.labels, rows0[i], OUT, dd.num_classes,
            **AUG)
        np.testing.assert_allclose(float(losses_a[i]), float(li),
                                   rtol=1e-5, atol=1e-6)

    # steady state: the real one-dispatch scan vs sequential steps
    rows1 = np.stack([dd.next_indices() for _ in range(K)])
    keys1 = jax.random.split(jax.random.PRNGKey(12), K)
    losses_a, _ = tr_a.multi_step_augmented_indexed(
        keys1, dd.images, dd.labels, rows1, OUT, dd.num_classes, **AUG)
    for i in range(K):
        li, _ = tr_b.step_augmented_indexed(
            keys1[i], dd.images, dd.labels, rows1[i], OUT, dd.num_classes,
            **AUG)
        np.testing.assert_allclose(float(losses_a[i]), float(li),
                                   rtol=1e-5, atol=1e-6)
    pa = jax.tree_util.tree_leaves([l.get_params() for l in net_a.layers])
    pb = jax.tree_util.tree_leaves([l.get_params() for l in net_b.layers])
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_fits_in_hbm(packed_dir):
    dd = DeviceResidentDataset(packed_dir, batch_size=4)
    assert fits_in_hbm(dd.packed)
    assert not fits_in_hbm(dd.packed, budget_bytes=100)


def test_expect_precrop_guard(packed_dir):
    """A stale pack (different canvas size than the caller intends) is
    rejected at construction — the resident sampler otherwise adopts the
    pack's own precrop and bypasses the streaming loader's mismatch check,
    silently training with wrong crop geometry."""
    DeviceResidentDataset(packed_dir, batch_size=4,
                          expect_precrop=(PRECROP, PRECROP))  # matches: ok
    with pytest.raises(ValueError, match="repack"):
        DeviceResidentDataset(packed_dir, batch_size=4,
                              expect_precrop=(PRECROP + 8, PRECROP + 8))


def test_sampler_state_shared_not_duplicated(packed_dir):
    """The pack is opened ONCE: the dataset's packed/_row_of are the
    sampler's own objects (no second mmap, no second O(N) row map)."""
    dd = DeviceResidentDataset(packed_dir, batch_size=4)
    assert dd.packed is dd._sampler.packed
    assert dd._row_of is dd._sampler._packed_row


def test_hbm_advisory_only_for_threaded_loaders(packed_dir, capsys):
    """The fits-in-HBM hint fires for a real streaming loader but NOT for
    sampler-only (start_thread=False) constructions — notably the one
    inside DeviceResidentDataset, which must not recommend the path it is
    already part of."""
    pp = ImagePreprocessor((OUT[0], OUT[1]), crop_mode="random",
                           precrop_size=(PRECROP, PRECROP))
    DeviceResidentDataset(packed_dir, batch_size=4)
    assert "DeviceResidentDataset" not in capsys.readouterr().err
    loader = ImageDataLoader(packed_dir, 4, pp, start_thread=True)
    try:
        assert "DeviceResidentDataset" in capsys.readouterr().err
    finally:
        loader.stop_thread()


def test_upload_with_replicated_mesh_sharding(packed_dir):
    """Constructor `sharding=` path (the DP deployment shape: dataset
    replicated over the mesh, (B,) indices per step): the preallocate +
    donated-update upload must land byte-exact on every device."""
    from dorknet_tpu.parallel.mesh import make_mesh, replicated

    mesh = make_mesh({"data": len(jax.devices())})
    dd = DeviceResidentDataset(packed_dir, batch_size=4,
                               sharding=replicated(mesh),
                               chunk_bytes=5 * PRECROP * PRECROP * 3)
    np.testing.assert_array_equal(np.asarray(dd.images), dd.packed.images)
    np.testing.assert_array_equal(np.asarray(dd.labels), dd.packed.labels)
    assert dd.images.sharding.is_fully_replicated
