"""MNIST basic convnet — the reference's first example, run the reference way.

Mirrors examples/MNIST_basic_convnet.py of the reference (same architecture,
batch 200, 14 epochs, SGDMomentum lr 0.01 m 0.9, lr x0.1 every 5 epochs); the
whole train step now executes as one fused jitted XLA program via Trainer
(set USE_FUSED_STEP=False for the reference's forward/backward/update loop —
numerically identical, two dispatches per step instead of one).

Requires MNIST .npy files under MNIST_data/ (scripts/MNISTprepper.py builds
them from the idx-ubyte downloads; see scripts/download_MNIST.sh).
"""

from tqdm import tqdm

from dorknet_tpu.models import MNISTNet
from dorknet_tpu.network import Trainer
from dorknet_tpu.optimisers import SGDMomentum
from dorknet_tpu.data_loading import get_MNIST_data, epoch_image_generator
from dorknet_tpu.data_loading.prefetch import device_prefetch

BATCH_SIZE = 200
USE_FUSED_STEP = True


def main():
    import os
    if not os.path.isdir("MNIST_data"):
        raise SystemExit("MNIST_data/ not found — run scripts/download_MNIST.sh "
                         "(or scripts/MNISTprepper.py on existing idx files).")
    X_train, y_train, X_val, y_val, X_test, y_test = get_MNIST_data(
        num_training=50000, num_validation=10000, num_test=10000)
    network = MNISTNet("MNISTDemo")
    sgd = SGDMomentum(network, 0.01, 0.9)
    trainer = Trainer(network, sgd)
    print(network)

    for e in range(1, 15, 1):
        print("Epoch {}:".format(e))
        if e % 5 == 0:
            sgd.multiply_learning_rate(0.1)
        batches = device_prefetch(
            epoch_image_generator(X_train, y_train, BATCH_SIZE, num_classes=10))
        for X_batch, y_batch, y_one_hot in tqdm(batches, total=50000 / BATCH_SIZE):
            if USE_FUSED_STEP:
                loss, _ = trainer.step(X_batch, y_one_hot)
            else:
                loss, batch_scores = network.forward(X_batch, y_one_hot)
                network.backward()
                sgd.update_weights()
        print("Testing...")
        test_acc = network.test(
            epoch_image_generator(X_test, y_test, BATCH_SIZE, num_classes=10),
            BATCH_SIZE, 10000)
        print("Test acc: {}".format(test_acc))


if __name__ == "__main__":
    main()
