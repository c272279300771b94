"""Benchmark harness — headline metric for the driver.

Measures steady-state training throughput (images/sec/chip) of the flagship
ResNet-18-depsep @225px, the reference's headline model
(examples/imagenet_dogs_225_resnet_18_depsep.py), using the fused jitted
train step (fwd + bwd + SGDMomentum update in one donated XLA program) with
device-resident batches (the input pipeline overlaps transfers; see
data_loading/prefetch.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (BASELINE.md) — vs_baseline is
therefore null.

Extra diagnostics go to stderr (per-batch-size sweep, step latency, CAM p50).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_train(batch_size, steps=20, warmup=4, image=225, classes=120):
    from dorknet_tpu.models import ResNet18
    from dorknet_tpu.optimisers import SGDMomentum
    from dorknet_tpu.network import Trainer

    np.random.seed(0)
    net = ResNet18("bench", num_classes=classes)
    opt = SGDMomentum(net, 0.05 * (batch_size / 200.0), 0.9)
    trainer = Trainer(net, opt)

    X = jax.device_put(np.random.randn(batch_size, 3, image, image).astype(np.float32))
    y = jax.device_put(np.eye(classes, dtype=np.float32)[
        np.random.randint(0, classes, batch_size)])
    jax.block_until_ready(X)

    for _ in range(warmup):
        loss, _ = trainer.step(X, y)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(steps):
        loss, _ = trainer.step(X, y)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    ips = batch_size * steps / dt
    log(f"train b={batch_size}: {dt / steps * 1e3:.2f} ms/step  {ips:.0f} img/s")
    return ips


def bench_cam_p50(runs=30):
    """CAM inference latency: test-mode forward + res8 feature tap + CAM
    projection for top-3 classes, single image (reference CAM flow, SURVEY §3.3)."""
    from dorknet_tpu.models import ResNet18
    from dorknet_tpu.cam import compute_cam_scores

    np.random.seed(0)
    net = ResNet18("cam-bench")
    X = jax.device_put(np.random.randn(1, 3, 225, 225).astype(np.float32))
    jax.block_until_ready(X)

    lat = []
    scores, cams = compute_cam_scores(net, X, top_k=3)  # compile
    jax.block_until_ready(cams)
    for _ in range(runs):
        t0 = time.perf_counter()
        scores, cams = compute_cam_scores(net, X, top_k=3)
        jax.block_until_ready(cams)
        lat.append(time.perf_counter() - t0)
    p50 = sorted(lat)[len(lat) // 2] * 1e3
    log(f"CAM p50: {p50:.2f} ms")
    return p50


def main():
    results = {}
    best = 0.0
    for b in (60, 128, 256):
        try:
            ips = bench_train(b)
            results[f"train_ips_b{b}"] = round(ips, 1)
            best = max(best, ips)
        except Exception as e:  # OOM etc. — report what we have
            log(f"batch {b} failed: {e}")
    try:
        results["cam_p50_ms"] = round(bench_cam_p50(), 2)
    except Exception as e:
        log(f"CAM bench failed: {e}")

    log("all results:", results)
    print(json.dumps({
        "metric": "resnet18_depsep_225px_train_images_per_sec_per_chip",
        "value": round(best, 1),
        "unit": "images/sec",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
