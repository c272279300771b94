#!/usr/bin/env bash
# Run the CPU image with the reference's two mounts (analogue of
# Docker/run_intel_container.sh: datasets at /Datasets, the working tree at
# /workspace so source edits don't need a rebuild). No --privileged needed —
# there is no device to expose.
set -euo pipefail
TAG=${1:-0.1}
DATASETS=${DATASETS:-$HOME/Datasets}
SRC=${SRC:-$(cd "$(dirname "$0")/.." && pwd)}
docker run --rm -it \
  -v "$DATASETS":/Datasets \
  -v "$SRC":/workspace \
  -e DORKNET_DATA=/Datasets \
  "dorknet-cpu:${TAG}" "${@:2}"
