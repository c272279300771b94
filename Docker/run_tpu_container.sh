#!/usr/bin/env bash
# Run a previously-built image with the dataset and source tree volume-mounted
# (analogue of the reference's Docker/run_intel_container.sh /
# run_cupy_container.sh — same two mounts: datasets at /Datasets, the working
# tree at /workspace for iterating without rebuilds). --privileged exposes the
# host TPU to the container (the libtpu device driver needs it).
set -euo pipefail
TAG=${1:-0.1}
DATASETS=${DATASETS:-$HOME/Datasets}
SRC=${SRC:-$(cd "$(dirname "$0")/.." && pwd)}
docker run --rm -it --privileged \
  -v "$DATASETS":/Datasets \
  -v "$SRC":/workspace \
  -e DORKNET_DATA=/Datasets \
  "dorknet-tpu:${TAG}" "${@:2}"
