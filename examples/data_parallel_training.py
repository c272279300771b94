"""Data-parallel training over a device mesh — the multi-chip recipe.

Runs on any number of devices (a v5e slice, or locally on virtual CPU devices:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
      python -m examples.data_parallel_training

The batch is sharded over the 'data' mesh axis; because jitted arrays have
global semantics, batch-norm statistics and gradient reductions become XLA
collectives over ICI automatically — no collective appears in user code.
On a multi-host pod, add dorknet_tpu.parallel.initialize() at the top and feed
each host its local_batch_slice.
"""

import os

import numpy as np
import jax

# honour JAX_PLATFORMS=cpu even when an accelerator PLUGIN is installed (the
# env var alone does not override a plugin backend — CLAUDE.md gotcha; this
# mirrors tests/conftest.py's working recipe)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from dorknet_tpu.models import ResNet18
from dorknet_tpu.network import Trainer
from dorknet_tpu.optimisers import SGDMomentum
from dorknet_tpu.parallel import make_mesh, batch_sharding

PER_DEVICE_BATCH = 8  # global batch = 8 * n_devices, so any count divides
STEPS = 5


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh({"data": n_dev})
    print("mesh:", dict(mesh.shape))
    global_batch = PER_DEVICE_BATCH * n_dev

    np.random.seed(0)
    net = ResNet18("dp-demo", num_classes=120)
    opt = SGDMomentum(net, 0.05 * (global_batch / 200.0), 0.9)
    sharding = batch_sharding(mesh)
    trainer = Trainer(net, opt, batch_sharding=sharding)

    # synthetic data; a real run feeds ImageDataLoader + device_prefetch
    X = np.random.randn(global_batch, 3, 64, 64).astype(np.float32)
    y = np.eye(120, dtype=np.float32)[np.random.randint(0, 120, global_batch)]

    for i in range(STEPS):
        loss, preds = trainer.step(X, y)
        print("step {} loss {:.4f}".format(i, float(loss)))

    placed = jax.device_put(X, sharding)  # public API, same placement
    print("batch sharded over {} devices".format(len(placed.sharding.device_set)))


if __name__ == "__main__":
    main()
