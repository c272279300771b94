"""Per-fusion device-time breakdown of the on-device augmentation program.

Round-2 context: the aug stage cost ~1.12x a train step per trained image,
roughly halving the chained aug->train pipeline's throughput, while a
bandwidth estimate (~18 MB/image of HBM traffic) said it SHOULD be ~10x
faster — i.e. op/layout bound, not bandwidth bound. That diagnosis led to
the fused Pallas aug kernel (ops/pallas/augment.py), now the TPU default:
this profile shows the kernel as one `_train_pipeline_impl` custom-call row
plus the XLA flip/mixup passes around it (round-3 session-5: 2.17
ms/dispatch at b128 vs 3.9 ms for the planes path). Force the planes path
with config.set_use_pallas_aug(False) to profile its fusion chain instead.

Run: python -m scripts.profile_aug [batch] [image]
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
from dorknet_tpu.data_loading.device_augment import train_pipeline  # noqa: E402
from dorknet_tpu.utils.profiling import (print_trace_summary,  # noqa: E402
                                         summarize_device_trace)

enable_compilation_cache("/tmp/jax_comp_cache_" + jax.default_backend())

AUG_ARGS = dict(hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
                rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
                crop_mode="random", mixup=(0.0, 0.3))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    image = int(sys.argv[2]) if len(sys.argv) > 2 else 225
    precrop = int(image * 1.25)

    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024))
    float((x @ x)[0, 0])
    print(f"link probe: {time.perf_counter() - t0:.1f}s", flush=True)

    # bench data created ON DEVICE (CLAUDE.md: a bulk device_put can stall
    # 30+ min through a degraded tunnel window)
    key = jax.random.PRNGKey(0)
    Xu = jax.random.randint(jax.random.PRNGKey(1),
                            (batch, precrop, precrop, 3), 0, 256, jnp.uint8)
    oh = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, 120),
        120, dtype=jnp.float32)

    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        out = train_pipeline(key, Xu, oh, (image, image), **AUG_ARGS)
        np.asarray(out[0][0, 0, 0, 0])  # compile + sync

        runs = 4
        d = tempfile.mkdtemp(prefix="aug_prof_")
        with jax.profiler.trace(d):
            for i in range(runs):
                out = train_pipeline(jax.random.PRNGKey(i), Xu, oh,
                                     (image, image), **AUG_ARGS)
            np.asarray(out[0][0, 0, 0, 0])

        top_ms, rows = summarize_device_trace(d, runs=runs)
        if top_ms <= 0:
            print("no jit_ device slices captured (degraded link or "
                  "profiler produced no trace) — rerun in a healthy window")
            return
        print_trace_summary(top_ms, rows,
                            title=f"aug program ({batch} src imgs)")
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)


if __name__ == "__main__":
    main()
