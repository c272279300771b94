"""Build an MNIST_data/ directory from sklearn's real handwritten digits.

The reference proves itself end-to-end by training its MNIST example to high
accuracy (reference examples/MNIST_basic_convnet.py:78-99). This bench host
has zero network egress, so the true MNIST idx files cannot be downloaded
(scripts/download_MNIST.sh needs a connection) — the closest REAL data
available offline is sklearn's bundled handwritten-digit set (1,797 genuine
scanned digits, 8x8). This script upscales them to 28x28 uint8 and writes
the exact npy layout scripts/MNISTprepper.py produces, so
examples/MNIST_basic_convnet.py runs its full recipe unmodified:

    python -m scripts.make_digits_mnist --out MNIST_data_digits
    DORKNET_MNIST_DIR=MNIST_data_digits DORKNET_NUM_TRAIN=1300 \
    DORKNET_NUM_VAL=137 DORKNET_NUM_TEST=360 DORKNET_BATCH=100 \
    DORKNET_METRICS=digits_mnist.metrics.jsonl \
        python -m examples.MNIST_basic_convnet

With the true MNIST files in place of these, the identical command (default
env) reproduces the reference's recipe exactly.
"""

import argparse
import os

import cv2
import numpy as np


def build(out_dir, n_test=360, seed=0):
    from sklearn.datasets import load_digits

    d = load_digits()
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(d.target))
    images = d.images[order]  # (N, 8, 8) float in [0, 16]
    labels = d.target[order].astype(np.uint8)
    up = np.stack([cv2.resize(im, (28, 28), interpolation=cv2.INTER_LINEAR)
                   for im in images])
    up = np.clip(up * (255.0 / 16.0), 0, 255).astype(np.uint8)
    up = up.reshape(len(up), 784)  # (N, 784), the prepper's layout
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "MNISTTrainImages.npy"), up[:-n_test])
    np.save(os.path.join(out_dir, "MNISTTrainLabels.npy"), labels[:-n_test])
    np.save(os.path.join(out_dir, "MNISTTestImages.npy"), up[-n_test:])
    np.save(os.path.join(out_dir, "MNISTTestLabels.npy"), labels[-n_test:])
    return len(up) - n_test, n_test


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out", default="MNIST_data_digits")
    ap.add_argument("--n-test", type=int, default=360)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    n_train, n_test = build(args.out, args.n_test, args.seed)
    print("wrote {}: {} train / {} test real handwritten digits".format(
        args.out, n_train, n_test))


if __name__ == "__main__":
    main()
