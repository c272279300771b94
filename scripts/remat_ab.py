"""Remat-as-a-BANDWIDTH-lever A/B on the real chip.

PERF.md round-4 established that both the flagship (ResNet-18-depsep) and
ResNet-50 train at their *bandwidth* roofline, not the MXU's: the flagship is
8.8:1 bandwidth:compute and R50 ~2.6:1 under XLA's schedule. The only way past
that ceiling is to REMOVE traffic, and the largest removable term is the saved
forward activations (written in fwd, read in bwd). ``jax.checkpoint`` trades
exactly that traffic for recompute FLOPs — which are nearly free on a
bandwidth-bound model.

This script A/Bs the three shipping remat policies of ``Trainer``
(``remat=False`` / ``"blocks"`` / ``True``; trainer.py:161-173) at the
benchmark configuration (b128 bf16 @225), interleaved in one window,
device-time basis (tunnel-immune). Numerics are already pinned equal by
tests/test_network.py::test_trainer_remat{,_blocks}_matches_plain, so this is
purely a throughput question.

Usage:
    python -m scripts.remat_ab [--models resnet18,resnet50] [--batch 128]

Reference analogue: none — the reference has no rematerialisation; this is a
TPU-native lever (SURVEY §6 roofline framing).
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _build(model, remat, classes):
    import dorknet_tpu
    from dorknet_tpu.models import ResNet18, ResNet50
    from dorknet_tpu.optimisers import SGDMomentum
    from dorknet_tpu.network import Trainer

    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        np.random.seed(0)
        cls = {"resnet18": ResNet18, "resnet50": ResNet50}[model]
        net = cls(f"rematab-{model}-{remat}", num_classes=classes)
        return Trainer(net, SGDMomentum(net, 0.064, 0.9), remat=remat)
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)


def run(models, batch=128, image=225, classes=120, rounds=3):
    import dorknet_tpu
    from bench import _device_batch, _device_time_ms

    X, y = _device_batch(batch, image, classes)
    results = {}
    for model in models:
        trainers = {str(r): _build(model, r, classes)
                    for r in (False, "blocks", True)}
        dorknet_tpu.set_compute_dtype(jnp.bfloat16)
        try:
            # compile + warm 3 steps each, then interleave timed windows.
            # 3 steps, not 1: BN's first-batch-adopt static trace flag means
            # step 2 RETRACES by design (CLAUDE.md), so a 1-step warm-up
            # would leave that recompile inside the first timed window
            # (same discipline as bench._bench_train_inner).
            for name, tr in trainers.items():
                t0 = time.perf_counter()
                for _ in range(3):
                    loss, _ = tr.step(X, y)
                float(loss)
                log(f"{model} remat={name}: compiled+3steps "
                    f"{time.perf_counter() - t0:.1f}s")
            wall = {}
            for _ in range(rounds):
                for name, tr in trainers.items():
                    t0 = time.perf_counter()
                    for _ in range(4):
                        loss, _ = tr.step(X, y)
                    float(loss)
                    dt = (time.perf_counter() - t0) / 4
                    wall[name] = min(wall.get(name, float("inf")), dt)
            for name, tr in trainers.items():
                dms = _device_time_ms(
                    lambda tr=tr: float(tr.step(X, y)[0]), runs=3)
                results[f"{model}_remat_{name}_device_ms"] = (
                    round(dms, 2) if dms else None)
                results[f"{model}_remat_{name}_wall_ms"] = round(
                    wall[name] * 1e3, 2)
                ips = batch / (dms / 1e3) if dms else batch / wall[name]
                log(f"{model} remat={name}: device "
                    f"{dms and round(dms, 2)} ms  wall "
                    f"{wall[name] * 1e3:.2f} ms  ({ips:.0f} img/s)")
        finally:
            dorknet_tpu.set_compute_dtype(jnp.float32)
    return results


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--models", default="resnet18,resnet50")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image", type=int, default=225)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()
    res = run([m.strip() for m in args.models.split(",") if m.strip()],
              batch=args.batch, image=args.image, rounds=args.rounds)
    import json

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
