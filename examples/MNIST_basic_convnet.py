"""MNIST basic convnet — the reference's first example, run the reference way.

Mirrors examples/MNIST_basic_convnet.py of the reference (same architecture,
batch 200, 14 epochs, SGDMomentum lr 0.01 m 0.9, lr x0.1 every 5 epochs); the
whole train step now executes as one fused jitted XLA program via Trainer
(set USE_FUSED_STEP=False for the reference's forward/backward/update loop —
numerically identical, two dispatches per step instead of one).

Requires MNIST .npy files under MNIST_data/ (scripts/MNISTprepper.py builds
them from the idx-ubyte downloads; see scripts/download_MNIST.sh).

Env knobs (defaults = the reference recipe; CI shrinks them to run this
actual ``__main__`` body, tests/test_examples_integration.py):
    DORKNET_MNIST_DIR    data directory (default MNIST_data)
    DORKNET_EPOCHS       epochs (default 14)
    DORKNET_BATCH        batch size (default 200)
    DORKNET_NUM_TRAIN / DORKNET_NUM_VAL / DORKNET_NUM_TEST  split sizes
    DORKNET_METRICS      JSONL accuracy-trajectory sidecar path ('' = off)
"""

import os

from tqdm import tqdm

from dorknet_tpu.models import MNISTNet
from dorknet_tpu.network import Trainer
from dorknet_tpu.optimisers import SGDMomentum
from dorknet_tpu.data_loading import get_MNIST_data, epoch_image_generator
from dorknet_tpu.data_loading.prefetch import device_prefetch

MNIST_DIR = os.environ.get("DORKNET_MNIST_DIR", "MNIST_data")
BATCH_SIZE = int(os.environ.get("DORKNET_BATCH", "200"))
EPOCHS = int(os.environ.get("DORKNET_EPOCHS", "14"))
NUM_TRAIN = int(os.environ.get("DORKNET_NUM_TRAIN", "50000"))
NUM_VAL = int(os.environ.get("DORKNET_NUM_VAL", "10000"))
NUM_TEST = int(os.environ.get("DORKNET_NUM_TEST", "10000"))
METRICS = os.environ.get("DORKNET_METRICS", "")
USE_FUSED_STEP = True


def main():
    if not os.path.isdir(MNIST_DIR):
        raise SystemExit("{}/ not found — run scripts/download_MNIST.sh "
                         "(or scripts/MNISTprepper.py on existing idx "
                         "files).".format(MNIST_DIR))
    X_train, y_train, X_val, y_val, X_test, y_test = get_MNIST_data(
        num_training=NUM_TRAIN, num_validation=NUM_VAL, num_test=NUM_TEST,
        mnist_dir=MNIST_DIR)
    network = MNISTNet("MNISTDemo")
    sgd = SGDMomentum(network, 0.01, 0.9)
    trainer = Trainer(network, sgd)
    print(network)
    metrics = None
    if METRICS:
        from dorknet_tpu.utils.metrics import MetricsLogger
        metrics = MetricsLogger(METRICS)

    for e in range(1, EPOCHS + 1, 1):
        print("Epoch {}:".format(e))
        if e % 5 == 0:
            sgd.multiply_learning_rate(0.1)
        batches = device_prefetch(
            epoch_image_generator(X_train, y_train, BATCH_SIZE, num_classes=10))
        loss = None
        for X_batch, y_batch, y_one_hot in tqdm(
                batches, total=len(X_train) / BATCH_SIZE):
            if USE_FUSED_STEP:
                loss, _ = trainer.step(X_batch, y_one_hot)
            else:
                loss, batch_scores = network.forward(X_batch, y_one_hot)
                network.backward()
                sgd.update_weights()
        print("Testing...")
        test_acc = network.test(
            epoch_image_generator(X_test, y_test, BATCH_SIZE, num_classes=10),
            BATCH_SIZE, len(X_test))
        print("Test acc: {}".format(test_acc))
        if metrics is not None:
            metrics.log(epoch=e, loss=float(loss), test_acc=float(test_acc),
                        lr=float(sgd.learning_rate))


if __name__ == "__main__":
    main()
