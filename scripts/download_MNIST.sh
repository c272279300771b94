#!/usr/bin/env bash
# Download MNIST idx-ubyte files into MNIST_data/ and convert to .npy
# (reference: scripts/download_MNIST.sh).
set -euo pipefail
mkdir -p MNIST_data
cd MNIST_data
BASE=https://storage.googleapis.com/cvdf-datasets/mnist
for f in train-images-idx3-ubyte train-labels-idx1-ubyte \
         t10k-images-idx3-ubyte t10k-labels-idx1-ubyte; do
  if [ ! -f "$f" ]; then
    curl -fsSLO "$BASE/$f.gz"
    gunzip -f "$f.gz"
  fi
done
cd ..
python scripts/MNISTprepper.py
