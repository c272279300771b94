"""Chip-free TRUE TPU AOT compile check for Pallas kernels AND the sharded
flagship train step.

Why this exists: the jax.export cross-lowering test
(tests/test_pallas_kernels.py::test_pallas_augment_lowers_to_tpu_mosaic)
exercises Mosaic's FRONT-END (primitive legality) but not the layout /
alignment legalisation that runs inside the libtpu AOT compile — the
augmentation kernel passed export and was then rejected on-chip with
"cannot statically prove that index in dimension 2 is a multiple of 8"
(PERF.md round-3 session-4). This script closes that gap without needing a
chip at all: it builds an ABSTRACT v5e topology from the locally installed
libtpu (`jax.experimental.topologies.get_topology_desc`) and runs the full
XLA+Mosaic AOT pipeline against it, exactly what the axon terminal's
chipless compile-helper does.

The ``flagship_dp_tp_step`` case AOT-compiles the production DP×TP-sharded
fused train step (cross-replica BN psum, grad all-reduce, the
custom_partitioning SPMD-safe depthwise dw rule) for a real 2x2 v5e mesh —
multi-chip evidence one tier stronger than the virtual-CPU dryrun, since the
collectives lower through the real TPU backend.

Usage:
    python -m scripts.aot_check [case ...]     # default: all cases

Exit codes: 0 = all compiled, 1 = at least one failed, 3 = no TPU topology
available (libtpu missing/unloadable) — callers treat 3 as SKIP.
"""

import os
import sys

# Before jax import: pin the CONCRETE backend to cpu (case construction may
# allocate small arrays; auto-discovery could block on a degraded axon
# tunnel) and stop libtpu from querying cloud metadata. The topology API
# loads the tpu PJRT plugin itself, independent of the platform setting.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _topology():
    from jax.experimental import topologies

    # v5e:2x2 is the smallest name the installed libtpu accepts with its
    # default 2x2x1 chips-per-host bounds; single-device cases compile for
    # device 0 of it, the sharded case uses all four abstract chips.
    return topologies.get_topology_desc("v5e:2x2", platform="tpu")


def _sds(tree, sharding_tree):
    """ShapeDtypeStructs mirroring ``tree``, carrying the target shardings —
    lowering honours per-arg shardings embedded in the avals, so no
    in_shardings plumbing is needed."""
    return jax.tree.map(
        lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
        tree, sharding_tree)


def _compile(fn, args):
    lowerable = fn if hasattr(fn, "lower") else jax.jit(fn)
    return lowerable.lower(*args).compile()


# --------------------------------------------------------------------------- #
# Cases: each takes the topology, returns (callable, arg ShapeDtypeStructs).
# --------------------------------------------------------------------------- #

def _case_augment(topo, crop_mode):
    """Fused crop+HSV+rotation kernel at the flagship shapes, with the
    PRODUCTION augmentation config (examples AUG_CFG / bench.py: rotation
    ±15°, the dogs HSV ranges) — Mosaic legalisation is shape-dependent,
    so the gate must compile the exact padded shear-plane sizes production
    traces."""
    from dorknet_tpu.ops.pallas import augment as A

    s = jax.sharding.SingleDeviceSharding(topo.devices[0])
    B, C, H, W, S = 2, 3, 288, 384, 225
    xs = jax.ShapeDtypeStruct((B, C, H, W), jnp.uint8, sharding=s)

    def p(shape, dt):
        return jax.ShapeDtypeStruct(shape, dt, sharding=s)

    ps = {"crop_r": p((B,), jnp.int32), "crop_c": p((B,), jnp.int32),
          "hsv_scales": p((B, 3), jnp.float32), "deg": p((B,), jnp.float32),
          "flip": p((B,), jnp.int32)}

    def fn(x, prm):
        return A.augment_planes_fused(
            x, prm, (S, S),
            hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
            rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
            crop_mode=crop_mode)

    return fn, (xs, ps)


def case_augment(topo):
    return _case_augment(topo, "random")


def case_augment_center(topo):
    # the center-crop branch lowers differently (static roll + slice)
    return _case_augment(topo, "center")


def _case_depthwise(topo, stride):
    from dorknet_tpu.ops.pallas.depthwise import depthwise3x3

    s = jax.sharding.SingleDeviceSharding(topo.devices[0])
    xs = jax.ShapeDtypeStruct((4, 32, 32, 128), jnp.bfloat16, sharding=s)
    ws = jax.ShapeDtypeStruct((128, 3, 3), jnp.float32, sharding=s)

    def fn(x, w):
        # value_and_grad compiles the fwd kernel AND the fused dx/dw VJP
        def loss(x, w):
            return jnp.sum(depthwise3x3(x, w, stride=stride)
                           .astype(jnp.float32))

        return jax.value_and_grad(loss, argnums=(0, 1))(x, w)

    return fn, (xs, ws)


def case_depthwise_s1(topo):
    return _case_depthwise(topo, 1)


def case_depthwise_s2(topo):
    return _case_depthwise(topo, 2)


def case_matmul(topo):
    from dorknet_tpu.ops.pallas.matmul import matmul

    s = jax.sharding.SingleDeviceSharding(topo.devices[0])
    a = jax.ShapeDtypeStruct((512, 384), jnp.float32, sharding=s)
    b = jax.ShapeDtypeStruct((384, 256), jnp.float32, sharding=s)
    return (lambda a, b: matmul(a, b)), (a, b)


def case_bn_stats(topo):
    from dorknet_tpu.ops.pallas.bn_stats import batch_norm_stats

    s = jax.sharding.SingleDeviceSharding(topo.devices[0])
    xs = jax.ShapeDtypeStruct((8, 56, 56, 128), jnp.float32, sharding=s)
    return batch_norm_stats, (xs,)


def case_matmul_bn_stats(topo):
    # the fused GEMM + BN-stats-epilogue kernel at a bf16 R50-block shape
    # (pointwise conv feeding BatchNorm — scripts/bn_fuse_ab.py's subject)
    from dorknet_tpu.ops.pallas.matmul import matmul_bn_stats

    s = jax.sharding.SingleDeviceSharding(topo.devices[0])
    a = jax.ShapeDtypeStruct((8 * 56 * 56, 64), jnp.bfloat16, sharding=s)
    b = jax.ShapeDtypeStruct((64, 256), jnp.bfloat16, sharding=s)
    return (lambda a, b: matmul_bn_stats(a, b)), (a, b)


def case_flagship_dp_tp_step(topo):
    """The production fused train step, DP×TP-sharded over a REAL 2x2 v5e
    mesh: cross-replica BN, grad all-reduce and TP boundary collectives all
    lower through the actual TPU backend (the virtual-CPU dryrun proves
    numerics; this proves the TPU lowering compiles). Uses the "taps"
    SPMD-safe dw rule: XLA cannot AOT-serialise custom_partitioning
    callbacks without a live backend ("Custom emitter for
    CustomSPMDPartitioning not found"), so the default "conv" rule is
    covered by the on-chip bench (spmd_dw_ok) and the virtual-CPU equality
    gates instead."""
    import numpy as np

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dorknet_tpu import config
    from dorknet_tpu.models import ResNet18
    from dorknet_tpu.network import Trainer
    from dorknet_tpu.optimisers import SGDMomentum
    from dorknet_tpu.parallel import (batch_sharding,
                                      model_parallel_param_shardings)

    mesh = Mesh(np.array(topo.devices[:4]).reshape(2, 2), ("data", "model"))
    net = ResNet18("aot", num_classes=120)
    opt = SGDMomentum(net, 0.015, 0.9)
    bsh = batch_sharding(mesh, "data")
    trainer = Trainer(net, opt, batch_sharding=bsh)

    params = net.gather_params()
    states = net.gather_states()
    cache = opt.init_cache(params)  # same treedef as params (zeros_like)
    p_shard = model_parallel_param_shardings(net, mesh, axis="model")
    rep = NamedSharding(mesh, P())

    args = (
        _sds(params, p_shard),
        _sds(states, jax.tree.map(lambda _: rep, states)),
        _sds(cache, p_shard),
        None,  # no EMA shadow configured
        jax.ShapeDtypeStruct((4, 3, 64, 64), jnp.float32, sharding=bsh),
        jax.ShapeDtypeStruct((4, 120), jnp.float32, sharding=bsh),
        jax.ShapeDtypeStruct((), jnp.float32, sharding=rep),
    )
    # the SPMD-safe grad rules are read at TRACE time (lower()); the sharded
    # trainer would enter this context itself in step() — the returned
    # context scopes them to THIS case's compile so later cases lower the
    # default rules
    import contextlib

    @contextlib.contextmanager
    def sharded_trace_ctx():
        prev_rule = config.get_spmd_dw_rule()
        config.set_spmd_dw_rule("taps")
        try:
            with config.spmd_safe_grads(True):
                yield
        finally:
            config.set_spmd_dw_rule(prev_rule)

    return trainer._get_step(), args, sharded_trace_ctx()


def case_fused_aug_step_bf16(topo):
    """The trainer's fused augment+train step with the pallas aug kernel ON
    under the PRODUCTION bf16 compute policy — the exact config the chip
    rejected in round-3 session-5: the policy routed hsv_dtype="bfloat16"
    into the kernel and Mosaic failed _bgr_to_hsv_chw's bf16 ``diff == 0``
    with "Target does not support this comparison" (HSV math is now pinned
    to fp32 for integer inputs on both paths). The standalone augment cases
    run fp32 HSV, so only this case covers the policy interaction."""
    import contextlib

    from dorknet_tpu import config
    from dorknet_tpu.models import ResNet18
    from dorknet_tpu.network import Trainer
    from dorknet_tpu.optimisers import SGDMomentum

    s = jax.sharding.SingleDeviceSharding(topo.devices[0])
    net = ResNet18("aot_aug", num_classes=120)
    opt = SGDMomentum(net, 0.015, 0.9)
    trainer = Trainer(net, opt)

    B, pre, S = 2, 281, 225
    params = net.gather_params()
    states = net.gather_states()
    cache = opt.init_cache(params)
    rep = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                                      sharding=s), params)

    # the aug static tuple _freeze_aug would build under the bf16 policy on
    # a TPU backend (out_hw, hsv, rot, flip, crop_mode, mixup, aug_dtype,
    # pallas_aug) — built by hand because _freeze_aug's pallas gate checks
    # the live backend, which is cpu here
    aug = ((S, S), ((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)), (-15.0, 15.0),
           0.5, "random", None, "bfloat16", True)

    args = (
        rep,
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                                    sharding=s), states),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                                    sharding=s), cache),
        None,  # no EMA shadow
        jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=s),  # PRNG key
        jax.ShapeDtypeStruct((B, pre, pre, 3), jnp.uint8, sharding=s),
        jax.ShapeDtypeStruct((B, 120), jnp.float32, sharding=s),
        jax.ShapeDtypeStruct((), jnp.float32, sharding=s),
    )

    @contextlib.contextmanager
    def bf16_policy_ctx():
        prev = config.get_compute_dtype()
        config.set_compute_dtype(jnp.bfloat16)
        try:
            yield
        finally:
            config.set_compute_dtype(prev)

    return trainer._get_aug_step(aug), args, bf16_policy_ctx()


CASES = {
    "augment": case_augment,
    "augment_center": case_augment_center,
    "fused_aug_step_bf16": case_fused_aug_step_bf16,
    "depthwise_s1": case_depthwise_s1,
    "depthwise_s2": case_depthwise_s2,
    "matmul": case_matmul,
    "matmul_bn_stats": case_matmul_bn_stats,
    "bn_stats": case_bn_stats,
    "flagship_dp_tp_step": case_flagship_dp_tp_step,
}


def main(argv):
    names = argv or list(CASES)
    unknown = [n for n in names if n not in CASES]
    if unknown:
        print(f"unknown cases: {unknown}; have {list(CASES)}")
        return 1
    try:
        topo = _topology()
    except Exception as e:
        print(f"SKIP: no tpu topology available ({type(e).__name__}: {e})")
        return 3

    import contextlib

    failed = []
    for name in names:
        # case construction INSIDE the try: one broken case must report FAIL
        # and let the remaining kernels still be validated
        try:
            case = CASES[name](topo)
            fn, shapes = case[0], case[1]
            ctx = case[2] if len(case) > 2 else contextlib.nullcontext()
            with ctx:
                compiled = _compile(fn, shapes)
            mem = compiled.memory_analysis()
            print(f"OK   {name}: code={mem.generated_code_size_in_bytes}B "
                  f"temp={mem.temp_size_in_bytes}B")
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            print(f"FAIL {name}: {type(e).__name__}: {msg}")
            failed.append(name)
    if failed:
        print(f"failed: {failed}")
        return 1
    print("all pallas kernels AOT-compile for TPU (chip-free)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
