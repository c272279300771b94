"""Device-time SERVING batch sweep for the flagship — finds the serving
batch sweet spot the way scripts/bench_batch_sweep_device.py found the
training one (b128, PERF.md round-3 item 00).

Round-3 measured the serving ladder at b128/256/512/1024 only (b128 won at
64,963 bf16 / 67,027 int8 device img/s); this sweeps the b64-b192
neighbourhood for both the BN-folded bf16 runner and the int8 calibrated
runner. Profiler device time (tunnel-immune); every thunk ends in a value
fetch (jax.block_until_ready does not sync through the axon link).

Run: python -m scripts.bench_serving_sweep [batch ...]
     (default: 64 96 112 128 144 160 192)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

try:  # persistent compile cache, same recipe as bench.py
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_comp_cache_" + jax.default_backend())
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

sys.path.insert(0, ".")
from bench import _device_time_ms, _device_batch, _init_bn  # noqa: E402

import dorknet_tpu  # noqa: E402
from dorknet_tpu.models import ResNet18  # noqa: E402
from dorknet_tpu.network import InferenceRunner, QuantizedInferenceRunner  # noqa: E402


def main(image=225, classes=120):
    batches = [int(b) for b in sys.argv[1:]] or [64, 96, 112, 128, 144,
                                                 160, 192]
    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024))
    float((x @ x)[0, 0])
    print(f"link probe: {time.perf_counter() - t0:.1f}s", flush=True)

    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        np.random.seed(0)
        net = ResNet18("serve-sweep", num_classes=classes)
        _init_bn(net, image, classes)  # garbage stats time 9-12% slower
        Xc = np.random.randn(8, 3, image, image).astype(np.float32)
        # calibrate ONCE — activation scales are batch-size independent;
        # every other batch size transplants them via set_scales (the
        # persistable-calibration contract, network/quantized.py)
        scales = None

        def fmt(v, spec):
            return format(v, spec) if v is not None else "n/a"

        rows = []
        for B in batches:
            X, _ = _device_batch(B, image, classes)
            runner = InferenceRunner(net, batch_size=B, fold_bn=True)
            float(runner._run_fixed(X)[0, 0])  # compile + sync
            qr = QuantizedInferenceRunner(net, batch_size=B)
            if scales is None:
                qr.calibrate([Xc])
                scales = qr.get_scales()
            else:
                qr.set_scales(scales)
            float(qr._run_fixed(X)[0, 0])
            out = {"B": B}
            for name, r in (("bf16", runner), ("int8", qr)):
                d = _device_time_ms(lambda r=r: float(r._run_fixed(X)[0, 0]),
                                    runs=4)
                out[name + "_ms"] = d
                out[name + "_ips"] = B / (d / 1e3) if d else None
            rows.append(out)
            print("B={}: bf16 {} ms = {} img/s | int8 {} ms = {} img/s".format(
                B, fmt(out["bf16_ms"], ".2f"), fmt(out["bf16_ips"], ",.0f"),
                fmt(out["int8_ms"], ".2f"), fmt(out["int8_ips"], ",.0f")),
                flush=True)
        print("\n| B | bf16 ms | bf16 img/s | int8 ms | int8 img/s |")
        print("|---|---|---|---|---|")
        for o in rows:
            print("| {} | {} | {} | {} | {} |".format(
                o["B"], fmt(o["bf16_ms"], ".2f"), fmt(o["bf16_ips"], ",.0f"),
                fmt(o["int8_ms"], ".2f"), fmt(o["int8_ips"], ",.0f")))
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)


if __name__ == "__main__":
    main()
