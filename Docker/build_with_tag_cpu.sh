#!/usr/bin/env bash
# Build the CPU image with a version tag (analogue of the reference's
# Docker/build_with_tag.sh, which built its Intel-CPU flavour; the TPU
# flavour's builder is build_with_tag.sh here).
set -euo pipefail
TAG=${1:-0.1}
docker build -t "dorknet-cpu:${TAG}" -f "$(dirname "$0")/Dockerfile-cpu" "$(dirname "$0")/.."
