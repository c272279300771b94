"""A/B the SPMD-safe depthwise weight-gradient rules on the real chip.

The safe rules only matter on sharded traces, but their DEVICE cost is a
single-chip property: forcing ``config.spmd_safe_grads`` on an unsharded
trainer compiles the exact same per-shard backward program a distributed
trainer runs (minus collectives). Three configurations on the flagship step:

  off   — plain XLA autodiff (the single-device production path; the dw it
          emits is what XLA SPMD mis-partitions on a mesh)
  conv  — custom_partitioning rule: XLA's fused filter-grad conv per shard +
          psum over batch axes (ops/conv.py:_dw_filter_grad_cp)
  taps  — explicit nine-tap multiply-reduce (the round-3 workaround;
          +39% backward-dw, kept as the fallback/oracle)

Expected: conv ≈ off (the +39% penalty of taps removed — the point of the
custom_partitioning rule). Run with the production policy:
    python -m scripts.bench_spmd_dw [batch] [image]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _device_time_ms  # noqa: E402

import dorknet_tpu  # noqa: E402
from dorknet_tpu import config  # noqa: E402
from dorknet_tpu.models import ResNet18  # noqa: E402
from dorknet_tpu.network import Trainer  # noqa: E402
from dorknet_tpu.optimisers import SGDMomentum  # noqa: E402


def measure(rule, batch, image, classes=120):
    """rule: None (safe grads off) | 'conv' | 'taps'."""
    np.random.seed(0)
    prev_rule = config.get_spmd_dw_rule()
    ctx = config.spmd_safe_grads(rule is not None)
    if rule is not None:
        config.set_spmd_dw_rule(rule)
    try:
        with ctx:
            net = ResNet18(f"ab-{rule}", num_classes=classes)
            trainer = Trainer(net, SGDMomentum(net, 0.05, 0.9))
            # bench data created ON DEVICE (CLAUDE.md: a bulk device_put of
            # host-random batches can stall 30+ min through the tunnel)
            kx, ky = jax.random.split(jax.random.PRNGKey(0))
            X = jax.random.normal(kx, (batch, 3, image, image), jnp.float32)
            y = jax.nn.one_hot(
                jax.random.randint(ky, (batch,), 0, classes), classes,
                dtype=jnp.float32)
            for _ in range(3):
                loss, _ = trainer.step(X, y)
            float(loss)
            dms = _device_time_ms(lambda: float(trainer.step(X, y)[0]), runs=3)
        return dms
    finally:
        config.set_spmd_dw_rule(prev_rule)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    image = int(sys.argv[2]) if len(sys.argv) > 2 else 225
    print(f"devices: {jax.devices()}")
    # link probe: a tiny fetch; if this takes >5 s the tunnel is degraded
    t0 = time.perf_counter()
    float(jnp.ones(()) + 1)
    print(f"link probe: {time.perf_counter() - t0:.2f}s")
    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    results = {}
    # interleave trials so link drift hits all configurations equally
    for trial in range(2):
        for rule in (None, "conv", "taps"):
            dms = measure(rule, batch, image)
            name = rule or "off"
            results.setdefault(name, []).append(dms)
            print(f"trial{trial} {name:5s}: {dms:.2f} ms/step device "
                  f"({batch / (dms / 1e3):.0f} img/s)")
    print("\nbest-of-trials (device ms/step):")
    base = min(results["off"])
    for name, vals in results.items():
        b = min(vals)
        print(f"  {name:5s}: {b:6.2f} ms  ({b / base:.3f}x vs off)")


if __name__ == "__main__":
    main()
