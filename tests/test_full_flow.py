"""The flagship training flow in miniature: images on disk → ImageDataLoader
(class discovery, mixup) → device-prefetched fused train steps → per-epoch val
accuracy → accuracy-stamped h5 checkpoints → crash-resume via Experiment.
Everything the imagenet-dogs example script does, on a synthetic 3-class
dataset small enough for CI."""

import os

import cv2
import numpy as np
import pytest

from dorknet_tpu.data_loading import (ImageDataLoader, ImagePreprocessor,
                                      device_prefetch)
from dorknet_tpu.network import FeedForwardNetwork, Trainer
from dorknet_tpu.layers import (ConvLayer, BatchNormLayer, ReLu,
                                GlobalAveragePoolingLayer, DenseLayer,
                                SoftmaxWithCrossEntropy)
from dorknet_tpu.regularisers.l2 import l2
from dorknet_tpu.optimisers import SGDMomentum
from dorknet_tpu.utils.experiment import Experiment


@pytest.fixture
def dataset(tmp_path):
    """3 colour-coded classes x 20 images, reference directory layout."""
    rng = np.random.RandomState(0)
    colors = {"reds": 2, "greens": 1, "blues": 0}  # BGR channel hot
    for cname, ch in colors.items():
        d = tmp_path / "train" / cname / "images"
        d.mkdir(parents=True)
        for i in range(20):
            im = rng.randint(0, 80, (40, 40, 3), dtype=np.uint8)
            im[:, :, ch] = rng.randint(150, 255, (40, 40), dtype=np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), im)
    return str(tmp_path / "train")


def build_net():
    net = FeedForwardNetwork("mini-dogs")
    net.add_layer(ConvLayer("conv0", filter_block_shape=(8, 3, 3, 3),
                            with_bias=False, weight_regulariser=l2(1e-4)))
    net.add_layer(BatchNormLayer("bn0", incoming_chans=8))
    net.add_layer(ReLu("relu0"))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("dense1", incoming_chans=8, output_dim=3,
                             weight_regulariser=l2(1e-4)))
    net.set_loss_layer(SoftmaxWithCrossEntropy("softmax"))
    return net


def test_flagship_flow_miniature(dataset, tmp_path):
    np.random.seed(0)
    pp_train = ImagePreprocessor(image_size=(32, 32), crop_mode="random")
    pp_val = ImagePreprocessor(image_size=(32, 32), crop_mode="center")

    train_loader = ImageDataLoader(dataset, batch_size=6, preprocessor=pp_train,
                                   class_balance=False,
                                   mixup_range_tuple=(0.0, 0.3), num_workers=2)
    val_loader = ImageDataLoader(dataset, batch_size=6, preprocessor=pp_val,
                                 class_balance=True, num_workers=2)
    exp = Experiment("mini-dogs", network_factory=build_net,
                     base_dir=str(tmp_path))
    try:
        net, start_epoch = exp.resume_or_init()
        assert start_epoch == 1
        sgd = SGDMomentum(net, 0.05, 0.9)
        trainer = Trainer(net, sgd)
        accs = []
        for e in range(start_epoch, 4):
            train_loader.shuffle_indices()
            if e == 3:
                sgd.multiply_learning_rate(0.5)
            # 16 steps/epoch: the loader thread draws crops/mixup from the
            # GLOBAL np.random concurrently, so realisations are schedule-
            # dependent (not seedable); with only 10 steps/epoch BN's 0.95-
            # momentum running stats were still ~21% stale at eval time and
            # the 0.8 bar occasionally failed under CPU contention. 48 total
            # steps leaves ~8% staleness and a real margin.
            steps = 16
            for X, yb, oh in device_prefetch(train_loader.pull_batch(steps)):
                loss, preds = trainer.step(np.asarray(X), np.asarray(oh))
            acc = net.test(val_loader.pull_batch(5), 6, 30)
            accs.append(acc)
            exp.save_epoch(net, e, acc)
        assert accs[-1] > 0.8, accs  # colour task is easy

        # "crash": new process-equivalent resume
        exp2 = Experiment("mini-dogs", network_factory=build_net,
                          base_dir=str(tmp_path))
        net2, start2 = exp2.resume_or_init()
        assert start2 == 4
        acc2 = net2.test(val_loader.pull_batch(5), 6, 30)
        assert acc2 > 0.8
        # checkpoint filenames carry the accuracy (reference convention)
        fnames = sorted(os.listdir(exp.dir))
        assert any(f.startswith("epoch_3_testacc_") for f in fnames)
    finally:
        train_loader.stop_thread()
        val_loader.stop_thread()
