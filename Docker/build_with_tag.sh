#!/usr/bin/env bash
# Build the TPU training image with a version tag (analogue of the
# reference's Docker/build_with_tag_cupy.sh accelerator flavour; the CPU
# flavour's builder is build_with_tag_cpu.sh).
set -euo pipefail
TAG=${1:-0.1}
docker build -t "dorknet-tpu:${TAG}" -f "$(dirname "$0")/Dockerfile" "$(dirname "$0")/.."
