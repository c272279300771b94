"""Serving-SLA harness: BatchingServer latency under offered load.

Drives the dynamic-batching front-end (network/serving.py) with a Poisson
open-loop client on the REAL chip and reports, per offered rate: achieved
throughput, request latency p50/p99, mean dispatch batch size, and shed
requests (max_pending backpressure). This is the deployment-facing number
the per-dispatch serving benches (bench_inference, bench_serving_sweep)
don't show: how request latency degrades as the arrival rate approaches
the compiled batch's service capacity.

Caveat on tunneled hosts: every dispatch pays the host link round-trip
(~10-40 ms through axon), so absolute latencies here are dominated by the
link; the SHAPE of the curve (flat until saturation, then queueing blowup)
and the batching ratio (rows/dispatch) are the portable signal.

Run: python -m scripts.bench_serving_load [batch] [image] [rate ...]
     rates are offered request rates in req/s (default sweeps around the
     measured single-dispatch capacity).
"""
import sys
import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import dorknet_tpu  # noqa: E402
from dorknet_tpu.config import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/tmp/jax_comp_cache_" + jax.default_backend())


def run_load(server, image, rate_rps, duration_s, rng):
    """Open-loop Poisson client: submit single-image requests at rate_rps
    for duration_s; returns (latencies_s, shed, served)."""
    from dorknet_tpu.network.serving import OverloadedError

    lat = []
    lat_mu = threading.Lock()
    shed = [0]
    x = rng.randn(3, image, image).astype(np.float32)

    def on_done(t0):
        def cb(fut):
            if fut.exception() is None:
                with lat_mu:
                    lat.append(time.perf_counter() - t0)
        return cb

    t_end = time.perf_counter() + duration_s
    while time.perf_counter() < t_end:
        t0 = time.perf_counter()
        try:
            server.submit(x).add_done_callback(on_done(t0))
        except OverloadedError:
            shed[0] += 1
        # Poisson arrivals: exponential inter-arrival gaps
        time.sleep(float(rng.exponential(1.0 / rate_rps)))
    # drain: wait for the queue to empty (bounded)
    deadline = time.perf_counter() + 30.0
    while time.perf_counter() < deadline:
        with lat_mu:
            done = len(lat)
        if done + shed[0] >= 0 and server._q.qsize() == 0:
            time.sleep(0.2)
            break
        time.sleep(0.05)
    with lat_mu:
        return list(lat), shed[0]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    image = int(sys.argv[2]) if len(sys.argv) > 2 else 225
    rates = [float(a) for a in sys.argv[3:]]

    t0 = time.perf_counter()
    xp = jnp.ones((1024, 1024))
    float((xp @ xp)[0, 0])
    print(f"link probe: {time.perf_counter() - t0:.1f}s", flush=True)

    from dorknet_tpu.models import ResNet18
    from dorknet_tpu.network import (BatchingServer, InferenceRunner,
                                     Trainer)
    from dorknet_tpu.optimisers import SGD

    np.random.seed(0)
    net = ResNet18("serve-load", num_classes=120)
    tr = Trainer(net, SGD(net, 0.01))
    X0 = jax.random.normal(jax.random.PRNGKey(0), (8, 3, image, image),
                           jnp.float32)
    y0 = jax.nn.one_hot(jnp.zeros((8,), jnp.int32), 120, dtype=jnp.float32)
    float(tr.step(X0, y0)[0])  # adopt BN stats

    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        runner = InferenceRunner(net, batch_size=batch, fold_bn=True)
        # single-dispatch service time (incl. link) calibrates the sweep
        xw = np.random.randn(batch, 3, image, image).astype(np.float32)
        runner.predict_probs(xw)
        t0 = time.perf_counter()
        for _ in range(3):
            runner.predict_probs(xw)
        disp_s = (time.perf_counter() - t0) / 3
        cap = batch / disp_s  # rows/s if every dispatch were full
        print(f"dispatch: {disp_s * 1e3:.1f} ms for b{batch} "
              f"-> capacity ~{cap:.0f} req/s", flush=True)
        if not rates:
            rates = [cap * f for f in (0.25, 0.5, 0.75, 0.9)]

        rng = np.random.RandomState(1)
        print(f"{'offered':>9s} {'served':>7s} {'shed':>5s} {'p50 ms':>8s} "
              f"{'p99 ms':>8s} {'rows/disp':>9s}")
        for rate in rates:
            server = BatchingServer(runner, max_wait_ms=5.0,
                                    max_pending=4 * batch)
            d0, r0 = server.dispatches, server.rows_served
            lat, shed = run_load(server, image, rate, duration_s=8.0, rng=rng)
            dd = server.dispatches - d0
            dr = server.rows_served - r0
            server.close()
            if not lat:
                print(f"{rate:9.0f} (no completions — link degraded?)")
                continue
            p50 = float(np.percentile(lat, 50)) * 1e3
            p99 = float(np.percentile(lat, 99)) * 1e3
            print(f"{rate:9.0f} {len(lat):7d} {shed:5d} {p50:8.1f} "
                  f"{p99:8.1f} {dr / max(1, dd):9.1f}", flush=True)
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)


if __name__ == "__main__":
    main()
