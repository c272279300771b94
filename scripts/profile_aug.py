"""Per-fusion device-time breakdown of the on-device augmentation program.

The aug stage costs ~1.12x a train step per trained image (PERF.md round-2),
which roughly halves the chained aug->train pipeline's throughput — but a
bandwidth estimate of the planes pipeline (~18 MB/image of HBM traffic) says
it SHOULD be ~10x faster than measured, i.e. it is op/layout bound, not
bandwidth bound. This script captures a jax.profiler trace of the aug program
alone and prints the top device fusions by total time, so the next
optimisation targets the real hotspot instead of a guess.

Run: python -m scripts.profile_aug [batch] [image]
"""
import glob
import gzip
import json
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_comp_cache_" + jax.default_backend())
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

sys.path.insert(0, ".")

import dorknet_tpu  # noqa: E402
from dorknet_tpu.data_loading.device_augment import train_pipeline  # noqa: E402

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

        ev = []
        for p in glob.glob(d + "/**/*.trace.json.gz", recursive=True):
            with gzip.open(p, "rt") as f:
                ev.extend(json.load(f).get("traceEvents", []))
        pidname = {e["pid"]: e["args"].get("name", "") for e in ev
                   if e.get("ph") == "M" and e.get("name") == "process_name"}
        dev_pids = {p for p, n in pidname.items()
                    if "TPU" in n or "tpu" in n or "device" in n.lower()}
        # leaf ops: exclude the enclosing jit_ slice, group by op name
        tot = defaultdict(float)
        count = defaultdict(int)
        top_level = 0.0
        for e in ev:
            if e.get("ph") != "X" or e.get("pid") not in dev_pids:
                continue
            name = e.get("name", "")
            if name.startswith("jit_"):
                top_level += e.get("dur", 0)
                continue
            tot[name] += e.get("dur", 0)
            count[name] += 1
        print(f"\naug program ({batch} src imgs): "
              f"{top_level / runs / 1e3:.2f} ms/dispatch device total")
        print(f"{'op':60s} {'ms/run':>9s} {'#':>5s} {'%':>6s}")
        items = sorted(tot.items(), key=lambda kv: -kv[1])
        for name, us in items[:30]:
            ms = us / runs / 1e3
            pct = 100.0 * us / max(top_level, 1)
            print(f"{name[:60]:60s} {ms:9.3f} {count[name] // runs:5d} "
                  f"{pct:6.1f}")
        rest = sum(us for _, us in items[30:])
        print(f"{'(rest)':60s} {rest / runs / 1e3:9.3f}")
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)


if __name__ == "__main__":
    main()
