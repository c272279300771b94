"""Chip-free TRUE TPU AOT compile check for every Pallas kernel.

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

Usage:
    python -m scripts.aot_check [case ...]     # default: all cases

Exit codes: 0 = all compiled, 1 = at least one failed, 3 = no TPU topology
available (libtpu missing/unloadable) — callers treat 3 as SKIP.
"""

import os
import sys

# Before jax import: let jax auto-pick platforms (the topology API loads the
# tpu plugin itself) and stop libtpu from querying cloud metadata.
os.environ["JAX_PLATFORMS"] = ""
os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _topology():
    from jax.experimental import topologies

    # v5e:2x2 is the smallest name the installed libtpu accepts with its
    # default 2x2x1 chips-per-host bounds; we compile single-device programs
    # for device 0 of it, so the extra abstract chips are inert.
    return topologies.get_topology_desc("v5e:2x2", platform="tpu")


def _compile(fn, args_shapes, sharding):
    """jit + lower + FULL AOT compile of fn on the abstract device.
    ``args_shapes`` is a tuple of (pytrees of) ShapeDtypeStructs."""
    shard_tree = tuple(jax.tree.map(lambda _: sharding, args_shapes))
    return jax.jit(fn, in_shardings=shard_tree).lower(*args_shapes).compile()


def case_augment():
    """Fused crop+HSV+rotation kernel at the flagship shapes."""
    from dorknet_tpu.ops.pallas import augment as A

    B, C, H, W, S = 2, 3, 288, 384, 225
    xs = jax.ShapeDtypeStruct((B, C, H, W), jnp.uint8)
    ps = {
        "crop_r": jax.ShapeDtypeStruct((B,), jnp.int32),
        "crop_c": jax.ShapeDtypeStruct((B,), jnp.int32),
        "hsv_scales": jax.ShapeDtypeStruct((B, 3), jnp.float32),
        "deg": jax.ShapeDtypeStruct((B,), jnp.float32),
        "flip": jax.ShapeDtypeStruct((B,), jnp.int32),
    }

    def fn(x, p):
        return A.augment_planes_fused(
            x, p, (S, S), hsv_pert_tuples=((0.9, 1.1),) * 3,
            rotation_tuple=(-10.0, 10.0), horizontal_flip_prob=0.5,
            crop_mode="random")

    return fn, (xs, ps)


def _case_depthwise(stride):
    from dorknet_tpu.ops.pallas.depthwise import depthwise3x3

    xs = jax.ShapeDtypeStruct((4, 32, 32, 128), jnp.bfloat16)
    ws = jax.ShapeDtypeStruct((128, 3, 3), jnp.float32)

    def fn(x, w):
        # value_and_grad compiles the fwd kernel AND the fused dx/dw VJP
        def loss(x, w):
            return jnp.sum(depthwise3x3(x, w, stride=stride)
                           .astype(jnp.float32))

        return jax.value_and_grad(loss, argnums=(0, 1))(x, w)

    return fn, (xs, ws)


def case_depthwise_s1():
    return _case_depthwise(1)


def case_depthwise_s2():
    return _case_depthwise(2)


def case_matmul():
    from dorknet_tpu.ops.pallas.matmul import matmul

    a = jax.ShapeDtypeStruct((512, 384), jnp.float32)
    b = jax.ShapeDtypeStruct((384, 256), jnp.float32)
    return (lambda a, b: matmul(a, b)), (a, b)


def case_bn_stats():
    from dorknet_tpu.ops.pallas.bn_stats import batch_norm_stats

    xs = jax.ShapeDtypeStruct((8, 56, 56, 128), jnp.float32)
    return batch_norm_stats, (xs,)


CASES = {
    "augment": case_augment,
    "depthwise_s1": case_depthwise_s1,
    "depthwise_s2": case_depthwise_s2,
    "matmul": case_matmul,
    "bn_stats": case_bn_stats,
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
    sharding = jax.sharding.SingleDeviceSharding(topo.devices[0])

    failed = []
    for name in names:
        fn, shapes = CASES[name]()
        try:
            compiled = _compile(fn, shapes, sharding)
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
