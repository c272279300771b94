"""Device-time batch sweep for the flagship — the measurement behind the
b128 headline (PERF.md round-3 item 00).

Wall-clock sweeps (scripts/bench_batch_sweep.py) carry the tunnel's 10-30 ms
dispatch floor and 10-100x degradation windows; this sweep reports the
jax.profiler DEVICE time per step, which is bit-stable across windows. Found:
b128 = 12.55 ms/step (10,197 img/s), +9.3% per-image over b256, with a cliff
right after 128 (b160 costs 2x b128's step for 1.25x the work — XLA
tiling/layout flip).

Run: python -m scripts.bench_batch_sweep_device [configs...]
     (default: b64 b96 b128 b128_k4 b160 b192 b256 b384 b512)
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _device_time_ms, _device_batch  # noqa: E402

import dorknet_tpu  # noqa: E402
from dorknet_tpu.models import ResNet18  # noqa: E402
from dorknet_tpu.optimisers import SGDMomentum  # noqa: E402
from dorknet_tpu.network import Trainer  # noqa: E402

# name -> (batch, remat, multi_step K)
CONFIGS = {
    "b64": (64, False, 1),
    "b96": (96, False, 1),
    "b128": (128, False, 1),
    "b128_k4": (128, False, 4),
    "b160": (160, False, 1),
    "b192": (192, False, 1),
    "b256": (256, False, 1),
    "b384": (384, False, 1),
    "b512": (512, False, 1),
    "b512_remat": (512, "blocks", 1),
}


def main(image=225, classes=120):
    names = sys.argv[1:] or ["b64", "b96", "b128", "b128_k4", "b160",
                             "b192", "b256", "b384", "b512"]
    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024))
    float((x @ x)[0, 0])
    print(f"link probe: {time.perf_counter() - t0:.1f}s", flush=True)
    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        for name in names:
            B, remat, k = CONFIGS[name]
            np.random.seed(0)
            net = ResNet18("swd-" + name, num_classes=classes)
            tr = Trainer(net, SGDMomentum(net, 0.05 * B / 200.0, 0.9),
                         remat=remat)
            try:
                if k == 1:
                    X, y = _device_batch(B, image, classes)
                    thunk = partial(lambda t, X, y: float(t.step(X, y)[0]),
                                    tr, X, y)
                else:
                    Xs, ys = _device_batch(B, image, classes, k=k)
                    thunk = partial(
                        lambda t, Xs, ys: float(t.multi_step(Xs, ys)[0][-1]),
                        tr, Xs, ys)
                thunk(); thunk()  # BN-adoption trace + steady-state trace
                dms = _device_time_ms(thunk, runs=2)
                if dms:
                    per_step = dms / k
                    print(f"{name}: {per_step:.2f} ms/step device "
                          f"({B / (per_step / 1e3):.0f} img/s)", flush=True)
                else:
                    print(f"{name}: no device time", flush=True)
            except Exception as e:
                print(f"{name}: SKIP ({type(e).__name__}: {str(e)[:100]})",
                      flush=True)
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)


if __name__ == "__main__":
    main()
