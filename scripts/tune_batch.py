"""Find a model's throughput-optimal training batch on this chip.

Sweeps candidate batch sizes with fresh traces (device time when the
profiler is available), prints the per-batch table, the sweet spot, and the
micro-batch plan for common larger effective batches — see
utils/autotune.py for why native big batches lose to accumulated b<sweet>
micro-batches on TPU.

Run: python -m scripts.tune_batch [--serving] [model] [image] [batch ...]
     model in {resnet18, mobilenet_v2, resnet50, mobilenet_v3,
               efficientnet_lite0}; default resnet18 @225, the PERF.md grid.
     --serving sweeps the BN-folded InferenceRunner instead of the train
     step ("accumulate k x bN" then reads as "k dispatches of bN").
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import dorknet_tpu  # noqa: E402
from dorknet_tpu.config import enable_compilation_cache  # noqa: E402
from dorknet_tpu.utils.autotune import (tune_serving_batch,  # noqa: E402
                                        tune_train_batch)

enable_compilation_cache("/tmp/jax_comp_cache_" + jax.default_backend())


def main():
    args = [a for a in sys.argv[1:] if a != "--serving"]
    serving = "--serving" in sys.argv[1:]
    model = args[0] if len(args) > 0 else "resnet18"
    image = int(args[1]) if len(args) > 1 else 225
    batches = tuple(int(a) for a in args[2:]) or (64, 96, 128, 160, 192,
                                                  256)

    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024))
    float((x @ x)[0, 0])
    print(f"link probe: {time.perf_counter() - t0:.1f}s", flush=True)

    from dorknet_tpu import models

    builders = {
        "resnet18": lambda n: models.ResNet18(n, num_classes=120),
        "mobilenet_v2": lambda n: models.MobileNetV2(n, num_classes=120),
        "resnet50": lambda n: models.ResNet50(n, num_classes=120),
        "mobilenet_v3": lambda n: models.MobileNetV3Small(n, num_classes=120),
        "efficientnet_lite0": lambda n: models.EfficientNetLite0(
            n, num_classes=120),
    }

    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        if serving:
            np.random.seed(0)
            net = builders[model]("tune-serve")
            # adopt BN running stats from one tiny training batch (the
            # runner refuses zero placeholders; garbage stats also measure
            # 9-12% slower — denormal/Inf activations)
            from dorknet_tpu.network import Trainer
            from dorknet_tpu.optimisers import SGD

            tr = Trainer(net, SGD(net, 0.01))
            X0 = jax.random.normal(jax.random.PRNGKey(0),
                                   (8, 3, image, image), jnp.float32)
            y0 = jax.nn.one_hot(jnp.zeros((8,), jnp.int32), 120,
                                dtype=jnp.float32)
            float(tr.step(X0, y0)[0])
            result = tune_serving_batch(net, batches, image=image)
        else:
            result = tune_train_batch(builders[model], batches, image=image)
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)

    print(f"\n{model} @{image}px bf16{' serving' if serving else ''}:")
    print(result.table())
    print(f"\nsweet spot: b{result.best_batch} "
          f"({result.best_ips:.0f} img/s)")
    for eff in (256, 512, 1024):
        mode, k, b = result.plan(eff)
        if mode == "native":
            how = f"native b{b} {'dispatch' if serving else 'step'}"
        elif serving:
            how = f"{k} dispatches of b{b}"
        else:
            how = f"Trainer.accumulate_step over {k} x b{b} micro-batches"
        if mode != "native" and k * b != eff:
            how += f" (realized effective b{k * b} — scale the LR to it)"
        print(f"effective b{eff}: {how}")


if __name__ == "__main__":
    main()
