"""A/B the fused Pallas depthwise kernel against XLA's grouped conv — the
VERDICT round-1 item 6 measurement.

Two levels, both interleaved inside one window (the tunnel drifts):
1. isolation: fwd and fwd+bwd on every depthwise shape the flagship uses
   (stride 1 AND 2), fp32 and bf16;
2. in-graph: the full ResNet-18-depsep fused train step (b256 @225px, bf16
   production policy) with config.set_use_pallas on vs off.

Timing ends with a value fetch (block_until_ready does not reliably block on
the tunneled platform — CLAUDE.md). Run: python -m scripts.bench_pallas_depthwise
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

try:  # same persistent-cache recipe as bench.py (survives older jax configs)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_comp_cache_" + jax.default_backend())
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe():
    x = jnp.ones((1024, 1024), jnp.float32)
    t0 = time.perf_counter()
    float((x @ x)[0, 0])
    dt = time.perf_counter() - t0
    log(f"probe matmul+fetch: {dt:.2f}s")
    return dt


# every depthwise shape in the flagship (B=256): (H, C, stride)
FLAGSHIP_DW = [(56, 64, 1), (28, 128, 1), (14, 256, 1), (7, 512, 1),
               (56, 64, 2), (28, 128, 2), (14, 256, 2)]


def bench_isolation(B=256, dtype=jnp.bfloat16, reps=6, inner=8):
    from dorknet_tpu.ops.pallas.depthwise import depthwise3x3
    from dorknet_tpu.ops.conv import depthwise_conv2d
    import dorknet_tpu

    dorknet_tpu.set_compute_dtype(dtype)
    results = {}
    try:
        for H, C, s in FLAGSHIP_DW:
            x = jax.device_put(np.random.randn(B, H, H, C).astype(np.float32)
                               ).astype(dtype)
            w = jax.device_put(np.random.randn(C, 3, 3).astype(np.float32))
            dyshape = ((H - 1) // s + 1)
            dy = jnp.ones((B, dyshape, dyshape, C), dtype)

            pf = jax.jit(lambda x_, w_: depthwise3x3(x_, w_, s))
            xf = jax.jit(lambda x_, w_: depthwise_conv2d(x_, w_, None, s, 1))
            pg = jax.jit(jax.grad(
                lambda x_, w_: jnp.sum(depthwise3x3(x_, w_, s)
                                       .astype(jnp.float32) * dy.astype(jnp.float32)),
                argnums=(0, 1)))
            xg = jax.jit(jax.grad(
                lambda x_, w_: jnp.sum(depthwise_conv2d(x_, w_, None, s, 1)
                                       .astype(jnp.float32) * dy.astype(jnp.float32)),
                argnums=(0, 1)))
            # compile all four first
            for f in (pf, xf):
                float(jnp.sum(f(x, w).astype(jnp.float32)))
            for f in (pg, xg):
                float(jnp.sum(f(x, w)[1]))

            best = {}
            for r in range(reps):
                for name, f, grad in (("pallas_f", pf, False), ("xla_f", xf, False),
                                      ("pallas_fb", pg, True), ("xla_fb", xg, True)):
                    t0 = time.perf_counter()
                    for _ in range(inner):
                        out = f(x, w)
                    if grad:
                        float(jnp.sum(out[1]))
                    else:
                        float(jnp.sum(out[0, 0, 0, :].astype(jnp.float32)))
                    best[name] = min(best.get(name, 1e9),
                                     (time.perf_counter() - t0) / inner)
            key = f"{H}x{H}x{C}s{s}"
            results[key] = {k: round(v * 1e3, 3) for k, v in best.items()}
            log(f"  {key}: fwd pallas {best['pallas_f']*1e3:.2f} vs xla "
                f"{best['xla_f']*1e3:.2f} ms | fwd+bwd pallas "
                f"{best['pallas_fb']*1e3:.2f} vs xla {best['xla_fb']*1e3:.2f} ms")
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)
    return results


def bench_in_graph(batch_size=256, image=225, classes=120, rounds=4, inner=4):
    import dorknet_tpu
    from dorknet_tpu.config import set_use_pallas
    from dorknet_tpu.models import ResNet18
    from dorknet_tpu.optimisers import SGDMomentum
    from dorknet_tpu.network import Trainer

    trainers = {}
    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        for name, flag in (("xla", False), ("pallas", True)):
            set_use_pallas(flag)
            np.random.seed(0)
            net = ResNet18("ab-" + name, num_classes=classes)
            trainers[name] = (Trainer(net, SGDMomentum(net, 0.064, 0.9)), flag)

        X = jax.device_put(np.random.randn(batch_size, 3, image, image)
                           .astype(np.float32))
        y = jax.device_put(np.eye(classes, dtype=np.float32)[
            np.random.randint(0, classes, batch_size)])

        # compile both under their flag (trace-time read)
        losses = {}
        for name, (tr, flag) in trainers.items():
            set_use_pallas(flag)
            loss, _ = tr.step(X, y)
            losses[name] = float(loss)
            # second warm step: the post-BN-adoption steady-state program is
            # a different trace — compile it OUTSIDE the timed rounds
            float(tr.step(X, y)[0])
        log(f"  first-step losses (sanity): {losses}")

        best = {}
        for r in range(rounds):
            for name, (tr, flag) in trainers.items():
                set_use_pallas(flag)
                t0 = time.perf_counter()
                for _ in range(inner):
                    loss, _ = tr.step(X, y)
                float(loss)
                best[name] = min(best.get(name, 1e9),
                                 (time.perf_counter() - t0) / inner)
    finally:
        set_use_pallas(False)
        dorknet_tpu.set_compute_dtype(jnp.float32)
    out = {k: {"ms_per_step": round(v * 1e3, 2),
               "img_per_s": round(batch_size / v, 1)} for k, v in best.items()}
    log(f"in-graph b{batch_size} bf16: {out}")
    return out


if __name__ == "__main__":
    log("backend:", jax.default_backend())
    probe()
    iso16 = bench_isolation(dtype=jnp.bfloat16)
    log("isolation bf16:", iso16)
    graph = bench_in_graph()
    probe()
    print({"isolation_bf16": iso16, "in_graph_bf16_b256": graph})
