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

    # ---------------------------------------------------------------- #
    # FSDP/ZeRO on a 2-axis mesh: params + optimiser state sharded over
    # the data axis (gathered just-in-time by XLA from the annotations),
    # batch over 'data', weights optionally split over 'model' (TP).
    # The SPMD-safe depthwise gradient rule engages automatically
    # (config.spmd_safe_grads — see ops/conv.py; zero overhead with the
    # default custom_partitioning rule).
    # ---------------------------------------------------------------- #
    if n_dev >= 4 and n_dev % 2 == 0:
        from dorknet_tpu.parallel import fsdp_param_shardings

        mesh2 = make_mesh({"data": n_dev // 2, "model": 2})
        np.random.seed(0)
        net_f = ResNet18("fsdp-demo", num_classes=120)
        opt_f = SGDMomentum(net_f, 0.05 * (global_batch / 200.0), 0.9)
        tr_f = Trainer(net_f, opt_f,
                       batch_sharding=batch_sharding(mesh2, "data"),
                       param_sharding=fsdp_param_shardings(net_f, mesh2,
                                                           axis="data"))
        for i in range(STEPS):
            loss_f, _ = tr_f.step(X, y)
        # note: early-step losses match the DP run to fp32 tolerance (the
        # strict equality gates are tests/test_parallel.py and
        # __graft_entry__.dryrun_multichip); after a few steps ANY two
        # configs — including single-device vs DP — drift apart by fp32
        # reduction-order chaos amplified through BN/softmax, so don't
        # read small late-step deltas as a correctness signal
        print("FSDP dp{}xtp2 loss {:.4f} (vs DP {:.4f}; equal to fp32 "
              "tolerance on early steps — see test_parallel for the "
              "strict gates)".format(n_dev // 2, float(loss_f), float(loss)))

    # ---------------------------------------------------------------- #
    # Spatial partitioning (SP): when the RESOLUTION is what's big (a
    # batch too small to data-shard), shard the image rows instead —
    # GSPMD inserts the conv/pool halo exchanges at row-shard boundaries
    # from the annotation alone. Here: B=2 images, rows split over every
    # device. Strict single-device equality gates live in
    # test_parallel::test_spatial_* and dryrun_multichip.
    # ---------------------------------------------------------------- #
    from dorknet_tpu.parallel import spatial_batch_sharding

    sp_mesh = make_mesh({"spatial": n_dev})
    np.random.seed(0)
    net_sp = ResNet18("sp-demo", num_classes=120)
    opt_sp = SGDMomentum(net_sp, 0.01, 0.9)
    tr_sp = Trainer(net_sp, opt_sp,
                    batch_sharding=spatial_batch_sharding(
                        sp_mesh, batch_axis=None))
    X_big = np.random.randn(2, 3, 64 * max(1, n_dev // 2), 64).astype(
        np.float32)
    y_big = np.eye(120, dtype=np.float32)[np.random.randint(0, 120, 2)]
    for i in range(2):
        loss_sp, _ = tr_sp.step(X_big, y_big)
    placed_sp = jax.device_put(X_big, tr_sp.batch_sharding)
    rows = placed_sp.addressable_shards[0].data.shape[2]
    print("SP: B=2 batch of H={} images row-sharded {} ways ({} rows/"
          "device), loss {:.4f}".format(X_big.shape[2], n_dev, rows,
                                        float(loss_sp)))


if __name__ == "__main__":
    main()
