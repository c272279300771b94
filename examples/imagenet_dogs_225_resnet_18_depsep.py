"""ImageNet-dogs ResNet-18-depsep training — the reference's flagship example.

Mirrors examples/imagenet_dogs_225_resnet_18_depsep.py of the reference: same
model (dorknet_tpu.models.ResNet18, identical layer names → interchangeable
checkpoints), batch 60, SGDMomentum lr 0.05*(B/200) m 0.9, lr x0.5 at epochs
16/20/25, mixup (0, 0.3), per-epoch validation + accuracy-stamped h5 save, and
the restart-from-checkpoint flow.

TPU-first differences from the reference's loop (same numbers, faster path):
* the train step is ONE fused jitted XLA program (Trainer);
* batches stream through a double-buffered async device_put (device_prefetch)
  instead of a blocking cp.asarray per step;
* set ON_DEVICE_AUGMENT=True to move crop/flip/HSV/rotation/mixup into a single
  vmapped jitted program on the TPU (host keeps decode+precrop-resize only);
* DORKNET_BF16=1 trains with the bf16 activation-flow policy (~1.8x step
  throughput, accuracy within 1% on the parity tasks — PERF.md), and
  DORKNET_EMA=0.999 keeps an EMA of the weights inside the fused step for
  serving (trainer.ema_network()).
"""

import os
import logging

import numpy as np
import jax
from tqdm import tqdm

from dorknet_tpu.models import ResNet18
from dorknet_tpu.network import Trainer
from dorknet_tpu.optimisers import SGDMomentum
from dorknet_tpu.data_loading import (
    ImageDataLoader, ImageAugmenter, ImagePreprocessor, device_prefetch,
)
from dorknet_tpu.utils.metrics import MetricsLogger

# Script-level constants in the reference's style (its examples ARE its config
# system, SURVEY §5); each reads an env override with the reference value as
# default so CI can execute this exact __main__ body against a synthetic
# dataset tree (tests/test_dogs_example_scripts.py) — set DORKNET_DATA plus
# the DORKNET_* knobs below for a tiny run.
BATCH_SIZE = int(os.environ.get("DORKNET_BATCH", "60"))
DOCKER = False
data_folder = "/Datasets" if DOCKER else os.environ.get(
    "DORKNET_DATA", os.path.expanduser("~/Datasets"))
ON_DEVICE_AUGMENT = os.environ.get("DORKNET_ON_DEVICE_AUGMENT", "0") == "1"
# DEVICE_RESIDENT: the dataset lives in device memory (uploaded once from a
# packed dir — auto-packed on first run), each step moves only (B,) int32
# indices, and gather+aug+mixup+train run as ONE dispatch
# (Trainer.step_augmented_indexed; 89% of the train-only wall ceiling,
# PERF.md round 5). Implies on-device augmentation.
DEVICE_RESIDENT = os.environ.get("DORKNET_DEVICE_RESIDENT", "0") == "1"
IMAGE_SIZE = int(os.environ.get("DORKNET_IMAGE", "225"))
EPOCHS = int(os.environ.get("DORKNET_EPOCHS", "40"))          # exclusive bound
TRAIN_SET_SIZE = int(os.environ.get("DORKNET_TRAIN_SIZE", "150473"))
VAL_SET_SIZE = int(os.environ.get("DORKNET_VAL_SIZE", str(120 * 50)))
NUM_WORKERS = int(os.environ.get("DORKNET_WORKERS", "8"))

AUG_CFG = dict(hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
               rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5)

def _require_dataset(path):
    if not os.path.isdir(path):
        raise SystemExit(
            "Dataset not found: {}\nExpected the ImageNet-dogs layout "
            "<class>/images/* (set DORKNET_DATA or edit data_folder). "
            "See scripts/make_class_name_map.py for the class map.".format(path))


if __name__ == "__main__":
    _require_dataset(os.path.join(data_folder, "ImageNet2012/ILSVRC2012_dogs/train_img"))
    resident_ds = None
    if DEVICE_RESIDENT:
        from dorknet_tpu.data_loading import DeviceResidentDataset
        from dorknet_tpu.data_loading.device_dataset import fits_in_hbm
        from dorknet_tpu.data_loading.packed_dataset import (
            PackedDataset, is_packed_dir, write_packed_dataset)

        train_root = os.path.join(
            data_folder, "ImageNet2012/ILSVRC2012_dogs/train_img")
        train_preprocessor = ImagePreprocessor(
            image_size=(IMAGE_SIZE, IMAGE_SIZE), crop_mode="random")
        pw, ph = train_preprocessor.precrop_size  # (w, h)
        if is_packed_dir(train_root):
            packed_root = train_root
        else:
            # decode once into the packed layout next to the source tree
            # (scripts/pack_dataset.py produces the same thing offline)
            packed_root = train_root.rstrip("/") + "_packed"
            if not is_packed_dir(packed_root):
                print("packing {} -> {} (one-time decode)".format(
                    train_root, packed_root))
                write_packed_dataset(train_root, packed_root, (ph, pw),
                                     num_workers=NUM_WORKERS,
                                     use_native_loader=True)
        # DORKNET_HBM_BUDGET (bytes) overrides the default dataset budget —
        # an ops knob for smaller chips, and what makes the fallback branch
        # CI-testable at toy scale
        hbm_budget = int(os.environ.get("DORKNET_HBM_BUDGET", 8 << 30))
        if not fits_in_hbm(PackedDataset(packed_root),
                           budget_bytes=hbm_budget):
            # the full 150k-image dogs set at 281px is ~35 GB — far past a
            # single chip's HBM; fall back to the streaming packed loader
            # (mmap row gathers + on-device augment) instead of OOMing
            # mid-upload
            print("DEVICE_RESIDENT: packed dataset exceeds the HBM budget "
                  "— falling back to the streaming packed loader "
                  "(on-device augment)")
            resident_ds = None
            # flip the effective mode so the rest of the script (lr scaling,
            # steps-per-epoch, the training-loop branch) follows the
            # streaming on-device-augment path
            DEVICE_RESIDENT = False
            ON_DEVICE_AUGMENT = True
            train_data_loader = ImageDataLoader(
                packed_root, BATCH_SIZE, train_preprocessor,
                class_balance=False, num_workers=NUM_WORKERS,
                emit_hwc_uint8=True)
        else:
            # one-time chunked upload; per-step host traffic is (B,)
            # indices. expect_precrop catches a stale pack left behind by
            # a run at a different DORKNET_IMAGE (silent wrong-geometry
            # training otherwise: the resident sampler adopts the pack's
            # own precrop, bypassing the streaming loader's check).
            resident_ds = DeviceResidentDataset(packed_root, BATCH_SIZE,
                                                class_balance=False,
                                                expect_precrop=(ph, pw))
            train_data_loader = None
    elif ON_DEVICE_AUGMENT:
        # host: decode + precrop-resize only; crop/HSV/rot/flip/mixup run as
        # one jitted program on the TPU (device_augment.train_pipeline)
        train_preprocessor = ImagePreprocessor(image_size=(IMAGE_SIZE, IMAGE_SIZE),
                                               crop_mode="random")
        train_data_loader = ImageDataLoader(
            os.path.join(data_folder, "ImageNet2012/ILSVRC2012_dogs/train_img"),
            BATCH_SIZE, train_preprocessor, class_balance=False,
            num_workers=NUM_WORKERS, emit_hwc_uint8=True)
    else:
        augmenter = ImageAugmenter(rotation_tuple=AUG_CFG["rotation_tuple"],
                                   hsv_pert_tuples=list(AUG_CFG["hsv_pert_tuples"]),
                                   horizontal_flip_prob=AUG_CFG["horizontal_flip_prob"])
        train_preprocessor = ImagePreprocessor(image_size=(IMAGE_SIZE, IMAGE_SIZE),
                                               crop_mode="random",
                                               image_augmenter=augmenter)
        train_data_loader = ImageDataLoader(
            os.path.join(data_folder, "ImageNet2012/ILSVRC2012_dogs/train_img"),
            BATCH_SIZE, train_preprocessor, class_balance=False,
            mixup_range_tuple=(0, 0.3), num_workers=NUM_WORKERS)
    val_preprocessor = ImagePreprocessor(image_size=(IMAGE_SIZE, IMAGE_SIZE),
                                         crop_mode="center")
    val_data_loader = ImageDataLoader(
        os.path.join(data_folder, "ImageNet2012/ILSVRC2012_dogs/val_img"),
        BATCH_SIZE, val_preprocessor, num_workers=NUM_WORKERS)

    # restart flow (reference :184-199): DORKNET_RESTART_CKPT names a saved
    # epoch h5 to resume from; DORKNET_START_EPOCH sets the resume epoch
    restart_ckpt = os.environ.get("DORKNET_RESTART_CKPT", "")
    restart = bool(restart_ckpt)
    starting_epoch = int(os.environ.get("DORKNET_START_EPOCH", "1"))
    experiment_name = os.environ.get("DORKNET_EXPERIMENT",
                                     "DogsImageNet225ResNet18DepSep")
    os.makedirs("logging", exist_ok=True)
    logging.basicConfig(filename="logging/" + experiment_name + ".log",
                        level=logging.DEBUG)
    logging.getLogger().addHandler(logging.StreamHandler())
    # machine-readable sidecar next to the free-text log: one JSON line per
    # record, append-mode so restart runs extend the same curve
    metrics = MetricsLogger("logging/" + experiment_name + ".metrics.jsonl")
    metrics.bind(batch=BATCH_SIZE, image_size=IMAGE_SIZE,
                 on_device_augment=ON_DEVICE_AUGMENT,
                 device_resident=DEVICE_RESIDENT)
    network = ResNet18(experiment_name, load_layers=True)
    if not os.path.isdir(experiment_name):
        os.mkdir(experiment_name)
    network.save_layer_structure_to_json(
        os.path.join(experiment_name, experiment_name + ".json"))

    if restart:
        # Restarting from a previous save point (the reference hardcodes
        # "epoch_15_testacc_0.4935.h5" here) — set the right starting epoch.
        network = ResNet18("", load_layers=False)
        network.load_network_from_json_and_h5(
            os.path.join(experiment_name, experiment_name + ".json"),
            os.path.join(experiment_name, restart_ckpt))
    print(network)
    network.to_gpu()
    if os.environ.get("DORKNET_BF16", "0") == "1":
        import jax.numpy as jnp
        import dorknet_tpu

        dorknet_tpu.set_compute_dtype(jnp.bfloat16)
        logging.info("bf16 activation-flow policy enabled")
    ema_decay = float(os.environ.get("DORKNET_EMA", "0") or 0) or None
    # device mixup emits BOTH convex orderings in one step (2x the source
    # batch), where the host loader emits them as two separate B-sized
    # batches — so the on-device path's effective step batch is 2B and the
    # reference's linear lr rule 0.05*(B/200) scales accordingly (and the
    # epoch uses half the pulls; see `steps` below)
    effective_batch = (2 * BATCH_SIZE if (ON_DEVICE_AUGMENT or DEVICE_RESIDENT)
                       else BATCH_SIZE)
    sgd = SGDMomentum(network, 0.05 * (effective_batch / 200.0), 0.9)
    trainer = Trainer(network, sgd, ema_decay=ema_decay)
    logging.info(network)

    try:
        for e in range(starting_epoch, EPOCHS, 1):
            running_loss_average = None
            logging.info("Epoch {}:".format(e))
            logging.info("Shuffling data: ")
            (resident_ds if DEVICE_RESIDENT
             else train_data_loader).shuffle_indices()
            correct_total = 0
            if e == 16 or e == 20 or e == 25:
                logging.info("Multiplying learning rate by 0.5")
                sgd.multiply_learning_rate(0.5)
            # one epoch = ~TRAIN_SET_SIZE trained images on all paths: the
            # host loader's mixup emits 2 batches per pull already; the device
            # paths train 2B per pull, so they need half the pulls
            steps = max(1, int(TRAIN_SET_SIZE / BATCH_SIZE /
                               (2 if (ON_DEVICE_AUGMENT or DEVICE_RESIDENT)
                                else 1)))
            if DEVICE_RESIDENT:
                batches = (resident_ds.next_indices() for _ in range(steps))
            else:
                batches = device_prefetch(train_data_loader.pull_batch(steps))
            aug_key = jax.random.PRNGKey(e)
            for i, item in enumerate(tqdm(batches, total=steps)):
                if DEVICE_RESIDENT:
                    # HBM-resident dataset: gather+one-hot+aug+mixup+train is
                    # ONE dispatch; only the (B,) index vector leaves the host
                    # (Trainer.step_augmented_indexed)
                    rows = item
                    y_batch = resident_ds.packed.labels[rows]
                    aug_key, k = jax.random.split(aug_key)
                    loss, preds = trainer.step_augmented_indexed(
                        k, resident_ds.images, resident_ds.labels, rows,
                        (IMAGE_SIZE, IMAGE_SIZE), resident_ds.num_classes,
                        crop_mode="random", mixup=(0.0, 0.3), **AUG_CFG)
                elif ON_DEVICE_AUGMENT:
                    X_batch, y_batch, y_one_hot = item
                    aug_key, k = jax.random.split(aug_key)
                    # the loader's uint8 batch goes in AS uint8 (the crop
                    # stage runs at 1 byte/pixel) and the whole aug+mixup+
                    # train step is ONE compiled dispatch
                    # (Trainer.step_augmented)
                    loss, preds = trainer.step_augmented(
                        k, X_batch, y_one_hot, (IMAGE_SIZE, IMAGE_SIZE),
                        crop_mode="random", mixup=(0.0, 0.3), **AUG_CFG)
                else:
                    X_batch, y_batch, y_one_hot = item
                    loss, preds = trainer.step(X_batch, y_one_hot)
                loss = float(loss)
                if running_loss_average is None:
                    running_loss_average = loss
                else:
                    running_loss_average = 0.9 * running_loss_average + 0.1 * loss
                # device mixup doubles the batch; the first half is dominated
                # by the original labels (lam <= 0.3)
                preds_np = np.asarray(preds)[:len(y_batch)]
                correct_total += int(np.sum(np.asarray(y_batch) == preds_np))
                if i % 10 == 0:
                    logging.info("Running loss average: {}".format(running_loss_average))
                    metrics.log(epoch=e, step=i, loss=loss,
                                loss_avg=running_loss_average,
                                lr=sgd.learning_rate)
                if (i % 100 == 0) and (i > 0):
                    logging.info(
                        "Running Ave Loss: {}, Loss: {}, Accuracy over current epoch so far: {} ".format(
                            running_loss_average, loss,
                            correct_total / (i * BATCH_SIZE)))
            logging.info("Testing...")
            test_acc = network.test(val_data_loader.pull_batch(
                max(1, int(VAL_SET_SIZE / BATCH_SIZE))), BATCH_SIZE,
                VAL_SET_SIZE)
            logging.info("Test acc: {}".format(test_acc))
            metrics.log(epoch=e, test_acc=test_acc,
                        epoch_train_acc=correct_total / (steps * BATCH_SIZE))
            network.save_weights_to_h5(os.path.join(
                experiment_name, "epoch_{}_testacc_{}.h5".format(e, test_acc)))
            if ema_decay is not None:
                trainer.ema_network().save_weights_to_h5(os.path.join(
                    experiment_name, "epoch_{}_ema.h5".format(e)))
    except Exception:
        if train_data_loader is not None:
            train_data_loader.stop_thread()
        val_data_loader.stop_thread()
        raise
    finally:
        metrics.close()
