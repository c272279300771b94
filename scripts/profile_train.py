"""Per-fusion device-time breakdown of the flagship fused train step.

The b128 bf16 step measures 12.55 ms on-device (10,199 img/s) — roughly 9%
of the v5e's bf16 MXU peak at the model's ~1.8 GFLOP/img train cost, which
is expected for a depthwise-separable net (dw convs and BN traffic are
bandwidth-bound, 1x1s have low arithmetic intensity) but leaves the question
of WHERE the time actually goes. This prints the top device fusions of one
`Trainer.step` dispatch so the next optimisation targets the real hotspot
(the same methodology that found the BN custom-VJP at 59% of the step in
round 2 — PERF.md).

Run: python -m scripts.profile_train [batch] [image] [model]
     model in {resnet18, mobilenet_v2, resnet50, mobilenet_v3,
               efficientnet_lite0}
"""
import sys
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import dorknet_tpu  # noqa: E402
from dorknet_tpu.config import enable_compilation_cache  # noqa: E402
from dorknet_tpu.utils.profiling import (print_trace_summary,  # noqa: E402
                                         summarize_device_trace)

enable_compilation_cache("/tmp/jax_comp_cache_" + jax.default_backend())


def _model(name, classes=120):
    from dorknet_tpu import models

    np.random.seed(0)
    builders = {
        "resnet18": lambda: models.ResNet18("p", num_classes=classes),
        "mobilenet_v2": lambda: models.MobileNetV2("p", num_classes=classes),
        "resnet50": lambda: models.ResNet50("p", num_classes=classes),
        "mobilenet_v3": lambda: models.MobileNetV3Small(
            "p", num_classes=classes),
        "efficientnet_lite0": lambda: models.EfficientNetLite0(
            "p", num_classes=classes),
    }
    return builders[name]()


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    image = int(sys.argv[2]) if len(sys.argv) > 2 else 225
    model = sys.argv[3] if len(sys.argv) > 3 else "resnet18"

    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024))
    float((x @ x)[0, 0])
    print(f"link probe: {time.perf_counter() - t0:.1f}s", flush=True)

    from dorknet_tpu.network import Trainer
    from dorknet_tpu.optimisers import SGDMomentum

    net = _model(model)
    tr = Trainer(net, SGDMomentum(net, 0.015, 0.9))

    # bench data created ON DEVICE (CLAUDE.md: a bulk device_put can stall
    # 30+ min through a degraded tunnel window)
    X = jax.random.normal(jax.random.PRNGKey(1), (batch, 3, image, image),
                          jnp.float32)
    oh = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, 120),
        120, dtype=jnp.float32)

    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        loss, _ = tr.step(X, oh)  # compile (+ BN init retrace on step 2)
        loss, _ = tr.step(X, oh)
        float(loss)

        runs = 4
        d = tempfile.mkdtemp(prefix="train_prof_")
        with jax.profiler.trace(d):
            for _ in range(runs):
                loss, _ = tr.step(X, oh)
            float(loss)

        top_ms, rows = summarize_device_trace(d, runs=runs)
        if top_ms <= 0:
            print("no jit_ device slices captured (degraded link or "
                  "profiler produced no trace) — rerun in a healthy window")
            return
        print_trace_summary(
            top_ms, rows,
            title=f"train step ({model} b{batch} @{image} bf16)")
        print(f"\n=> {batch / (top_ms / 1e3):.0f} img/s device")
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)


if __name__ == "__main__":
    main()
