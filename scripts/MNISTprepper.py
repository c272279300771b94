"""Convert the idx-ubyte MNIST downloads into the .npy files
data_loading.MNIST_data_loading expects (reference: scripts/MNISTprepper.py)."""

import os
import struct

import numpy as np


def read_idx(fname):
    with open(fname, "rb") as f:
        zero, dtype, ndim = struct.unpack(">HBB", f.read(4))
        shape = tuple(struct.unpack(">I", f.read(4))[0] for _ in range(ndim))
        return np.frombuffer(f.read(), dtype=np.uint8).reshape(shape)


if __name__ == "__main__":
    out_dir = "MNIST_data"
    os.makedirs(out_dir, exist_ok=True)
    pairs = [
        ("train-images-idx3-ubyte", "MNISTTrainImages.npy", True),
        ("train-labels-idx1-ubyte", "MNISTTrainLabels.npy", False),
        ("t10k-images-idx3-ubyte", "MNISTTestImages.npy", True),
        ("t10k-labels-idx1-ubyte", "MNISTTestLabels.npy", False),
    ]
    for src, dst, is_images in pairs:
        arr = read_idx(os.path.join(out_dir, src))
        if is_images:
            arr = arr.reshape(arr.shape[0], -1)  # (N, 784), as the loader expects
        np.save(os.path.join(out_dir, dst), arr)
        print("wrote", dst, arr.shape)
