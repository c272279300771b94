#!/usr/bin/env bash
# Run the training image with a dataset volume mounted at /Datasets
# (the examples' DOCKER=true path expects this layout, mirroring the reference).
set -euo pipefail
IMAGE=${IMAGE:-dorknet-tpu}
DATASETS=${DATASETS:-$HOME/Datasets}
docker build -t "$IMAGE" -f Docker/Dockerfile .
docker run --rm -it --privileged \
  -v "$DATASETS":/Datasets \
  -e DORKNET_DATA=/Datasets \
  "$IMAGE" "$@"
