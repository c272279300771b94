"""On-chip A/B: Pallas GEMM+BN-stats epilogue vs XLA's two-pass schedule.

VERDICT r4 item 3. The R50 step trace is 61.9% reduce-family fusions —
BN statistics (and dgamma/dbeta) passes that RE-READ conv outputs from HBM
(PERF.md round-4). The roofline model's "perfect" schedule assumes those
stats are free in the conv's epilogue. This harness measures whether a
Pallas kernel actually delivers that on ONE representative block: the
pointwise conv -> BatchNorm pair, as

  A (XLA production): y = x @ w (bf16), then mean/var re-read y — the
    convert_reduce the trace shows;
  B (Pallas fused):   ops.pallas.matmul.matmul_bn_stats — sum/sum-of-
    squares accumulated in VMEM while each output tile is produced, y
    written once and never re-read;
  C (split Pallas):   XLA GEMM + the single-pass Pallas stats kernel
    (ops.pallas.bn_stats) — isolates the epilogue-fusion win from the
    plain one-pass-stats win.

Shapes: R50 b128's memory-bound early 1x1 (64->256 @ 56px: measured
36 TF/s, HBM-bound) and a deep 1x1 (1024->256 @ 14px: 127 TF/s,
MXU-bound) — the fusion should matter exactly where the trace says the
step lives (early/wide layers).

Timing: device-time profiler (tunnel-immune), trials interleaved A/B/C
inside the same window. Inputs created ON device; every timed call fetches
a value (the only true sync on axon). Emits one JSON dict on stdout.

Usage: python -m scripts.bn_fuse_ab [--rounds 3] [--runs 3]
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# (name, H, Cin, Cout) at b128 — R50 block shapes (models/resnet.py)
SHAPES = [
    ("early_64_256_s56", 56, 64, 256),
    ("deep_1024_256_s14", 14, 1024, 256),
]


def _variants(x, w, interpret=False):
    """name -> jitted (y, mean, var) program. All take (x, w) bf16 and
    return y bf16 + fp32 stats so the three programs do identical IO.
    interpret=True runs the Pallas kernels in interpreter mode (CPU test
    platforms)."""
    from dorknet_tpu.ops.pallas.bn_stats import batch_norm_stats
    from dorknet_tpu.ops.pallas.matmul import matmul_bn_stats

    @jax.jit
    def xla(x, w):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        yb = y.astype(jnp.bfloat16)
        # production BN stats path: a separate reduce pass over the STORED
        # bf16 activation (ops/norm.py upcasts to fp32 internally) — the
        # convert_reduce fusion in the trace
        yf = yb.astype(jnp.float32)
        mean = jnp.mean(yf, axis=0)
        var = jnp.mean(yf * yf, axis=0) - mean * mean
        return yb, mean, jnp.maximum(var, 0.0)

    @jax.jit
    def fused(x, w):
        return matmul_bn_stats(x, w, out_dtype=jnp.bfloat16,
                               interpret=interpret)

    @jax.jit
    def split(x, w):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        yb = y.astype(jnp.bfloat16)
        mean, var = batch_norm_stats(yb, interpret=interpret)
        return yb, mean, var

    return {"xla": xla, "pallas_fused": fused, "pallas_split": split}


def run(rounds=3, runs=3, batch=128, shapes=None):
    from dorknet_tpu.utils.autotune import measure_device_ms

    interpret = jax.default_backend() != "tpu"
    results = {}
    for name, H, cin, cout in (shapes or SHAPES):
        M = batch * H * H
        kx, kw = jax.random.split(jax.random.PRNGKey(0))
        # data created ON device (never bulk-upload through the tunnel)
        x = jax.random.normal(kx, (M, cin), jnp.bfloat16)
        w = jax.random.normal(kw, (cin, cout), jnp.bfloat16) * 0.05
        variants = _variants(x, w, interpret=interpret)

        # compile + correctness gate first
        outs = {}
        for vname, fn in variants.items():
            t0 = time.perf_counter()
            y, mean, var = fn(x, w)
            outs[vname] = (np.asarray(mean), np.asarray(var))
            log(f"{name} {vname}: compiled+1call "
                f"{time.perf_counter() - t0:.1f}s")
        ref_m, ref_v = outs["xla"]
        ok = True
        for vname in ("pallas_fused", "pallas_split"):
            m, v = outs[vname]
            # fused accumulates from the fp32 MXU product (pre-bf16-rounding
            # of y) — small systematic delta vs the re-read path is expected
            em = np.max(np.abs(m - ref_m)) / max(1e-6, np.max(np.abs(ref_m)))
            ev = np.max(np.abs(v - ref_v)) / max(1e-6, np.max(np.abs(ref_v)))
            ok = ok and em < 2e-2 and ev < 2e-2
            results[f"{name}_{vname}_stats_rel_err"] = round(
                float(max(em, ev)), 6)
        results[f"{name}_stats_ok"] = bool(ok)

        # interleaved device-time windows
        dev = {vname: [] for vname in variants}
        for r in range(rounds):
            for vname, fn in variants.items():
                ms = measure_device_ms(
                    lambda fn=fn: np.asarray(fn(x, w)[1]), runs=runs)
                if ms is not None:
                    dev[vname].append(ms)
                log(f"{name} {vname} round {r}: {ms and round(ms, 3)} ms "
                    "device")
        for vname, ms_list in dev.items():
            if ms_list:
                results[f"{name}_{vname}_device_ms"] = round(min(ms_list), 3)
        a = results.get(f"{name}_xla_device_ms")
        b = results.get(f"{name}_pallas_fused_device_ms")
        if a and b:
            results[f"{name}_fused_speedup"] = round(a / b, 3)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    results = run(rounds=args.rounds, runs=args.runs)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
