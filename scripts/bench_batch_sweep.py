"""Batch-size / remat / multi-step sweep for the flagship under the bf16
production policy — closes the round-1 PERF.md open item ("batch 512/1024
(+remat) sweep under bf16; larger multi_step K").

All configs are compiled first, then trials are INTERLEAVED round-robin in one
window (the tunnel drifts 10-100x across minutes; sequential comparisons are
confounded). Every timed window ends with a value fetch. Best-of-trials per
config. Run: python -m scripts.bench_batch_sweep
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
    log(f"probe matmul+fetch: {time.perf_counter() - t0:.2f}s")


# (name, batch, remat, multi_step_k)
CONFIGS = [
    ("b256", 256, False, 1),
    ("b256_k8", 256, False, 8),
    ("b512", 512, False, 1),
    ("b512_remat", 512, "blocks", 1),
    ("b1024_remat", 1024, "blocks", 1),
]


def main(image=225, classes=120, rounds=4):
    import dorknet_tpu
    from dorknet_tpu.models import ResNet18
    from dorknet_tpu.optimisers import SGDMomentum
    from dorknet_tpu.network import Trainer

    probe()

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def _make_data(key, shape):
        # data is created ON DEVICE: a (k, B, 3, 225, 225) fp32 upload through
        # the tunnel is GBs and can stall for minutes — never device_put bulk
        # random batches on this host
        kx, ky = jax.random.split(key)
        X = jax.random.normal(kx, shape, jnp.float32)
        labels = jax.random.randint(ky, shape[:-3], 0, classes)
        y = jax.nn.one_hot(labels, classes, dtype=jnp.float32)
        return X, y

    runs = {}
    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        for name, B, remat, k in CONFIGS:
            np.random.seed(0)
            net = ResNet18("sw-" + name, num_classes=classes)
            tr = Trainer(net, SGDMomentum(net, 0.05 * B / 200.0, 0.9),
                         remat=remat)
            if k == 1:
                X, y = _make_data(jax.random.PRNGKey(0), (B, 3, image, image))

                def thunk(tr=tr, X=X, y=y):
                    loss, _ = tr.step(X, y)
                    return loss
            else:
                Xs, ys = _make_data(jax.random.PRNGKey(0),
                                    (k, B, 3, image, image))

                def thunk(tr=tr, Xs=Xs, ys=ys):
                    losses, _ = tr.multi_step(Xs, ys)
                    return losses[-1]
            try:
                float(thunk())  # compile (BN-adoption trace) + sync
                # second call compiles the STEADY-STATE trace (BN initialised
                # is a different static signature — CLAUDE.md); without it
                # round 0 of the timed loop pays a 30-60 s compile
                float(thunk())
            except Exception as e:
                log(f"  {name}: SKIP ({type(e).__name__}: {str(e)[:120]})")
                continue
            runs[name] = (thunk, B, k)
            log(f"  {name}: compiled")

        best = {}
        for r in range(rounds):
            for name, (thunk, B, k) in runs.items():
                inner = max(1, 4 // k)
                t0 = time.perf_counter()
                for _ in range(inner):
                    loss = thunk()
                float(loss)
                dt = (time.perf_counter() - t0) / (inner * k)
                best[name] = min(best.get(name, 1e9), dt)
            # progressive snapshot — partial data survives a timeout
            log(f"round {r}: " + "  ".join(
                f"{n}={runs[n][1] / best[n]:.0f}img/s" for n in best))
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)

    probe()
    out = {}
    for name, (thunk, B, k) in runs.items():
        dt = best[name]
        out[name] = {"ms_per_step": round(dt * 1e3, 2),
                     "img_per_s": round(B / dt, 1)}
        log(f"{name}: {dt * 1e3:.1f} ms/step  {B / dt:.0f} img/s")
    print(out)


if __name__ == "__main__":
    main()
