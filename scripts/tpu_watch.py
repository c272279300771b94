"""TPU-tunnel recovery watcher: probe until healthy, then run the bench battery.

The axon tunnel (the path to the one real TPU chip) has shown multi-hour
outages where even jax backend enumeration blocks forever (PERF.md round-3
session-3).  This watcher polls with a subprocess probe (a hung device call
cannot be interrupted in-process) and, on the first healthy window, runs a
battery of measurement harnesses — each itself a subprocess with a hard
timeout so a mid-battery relapse cannot wedge the watcher.

Usage:
    python scripts/tpu_watch.py [--out DIR] [--deadline-s N] [--poll-s N]

Battery (in order, cheapest diagnostic value first):
    1. bench.py               — the full driver artifact (serving, stretch,
                                pallas_ok, fused-aug keys) under BENCH_BUDGET_S
    2. scripts.profile_train  — per-fusion hotspot table of the flagship
                                train step
    3. scripts.profile_aug    — per-fusion device-time breakdown of the
                                augmentation program
    4. scripts.bench_serving_sweep — serving batch sweet-spot curve

Each battery item's stdout/stderr lands in <out>/NN_<name>.log; a summary
line per item goes to <out>/watch.log.  Exit code 0 = battery ran (check the
logs for each item's own status), 2 = deadline passed with no healthy window.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The probe must exercise the TUNNEL, never an inherited forced platform: a
# JAX_PLATFORMS=cpu left over from a test shell would make a dead tunnel look
# healthy and burn the one-shot battery on CPU numbers. The probe subprocess
# therefore clears the override and takes the default (axon) platform.
PROBE_CODE = (
    "import time, jax, jax.numpy as jnp\n"
    "t0 = time.perf_counter()\n"
    "x = jnp.ones((256, 256))\n"
    "print(float((x @ x)[0, 0]), time.perf_counter() - t0)\n"
)

# Registry of runnable battery items: name -> (argv, timeout_s, extra_env).
# Select with --battery name1,name2 (default DEFAULT_BATTERY below).
BATTERY_REGISTRY = {
    "bench": ([sys.executable, "bench.py"], 1500, {"BENCH_BUDGET_S": "1200"}),
    "remat_ab": ([sys.executable, "-m", "scripts.remat_ab"], 1800, {}),
    "bn_fuse_ab": ([sys.executable, "-m", "scripts.bn_fuse_ab"], 1200, {}),
    "profile_train":
        ([sys.executable, "-m", "scripts.profile_train", "128", "225"], 900, {}),
    "profile_aug":
        ([sys.executable, "-m", "scripts.profile_aug", "128", "225"], 900, {}),
    "serving_sweep":
        ([sys.executable, "-m", "scripts.bench_serving_sweep",
          "96", "112", "128", "144"], 900, {}),
    "dogs_convergence":
        ([sys.executable, "-m", "scripts.train_synth_dogs"], 3600, {}),
    # dataset-free demos — on-chip smoke of the serving ladder and the
    # train->CAM flow (CI runs them on CPU; this captures a real-TPU log)
    "serving_demo":
        ([sys.executable, "-m", "examples.serving_demo"], 1500, {}),
    "cam_demo":
        ([sys.executable, "-m", "examples.synthetic_cam_demo"], 1500, {}),
}

# session-5 refresh: profile_aug / serving_sweep were captured (PERF.md
# round-3 session-5/6); the standing battery is the full bench plus the
# train-step hotspot profile
DEFAULT_BATTERY = "bench,profile_train,profile_aug,serving_sweep"


def log(out_dir: str, msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(os.path.join(out_dir, "watch.log"), "a") as f:
        f.write(line + "\n")


def probe(timeout_s: float) -> tuple[bool, float]:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    t0 = time.perf_counter()
    try:
        subprocess.run([sys.executable, "-c", PROBE_CODE], timeout=timeout_s,
                       check=True, capture_output=True, cwd=REPO, env=env)
        return True, time.perf_counter() - t0
    except Exception:
        return False, time.perf_counter() - t0


def run_battery(out_dir: str, probe_timeout_s: float, battery) -> None:
    for i, (name, argv, timeout_s, extra_env) in enumerate(battery, 1):
        # re-probe between items with the SAME health bar as the main loop
        # (ok AND fast): a relapsed-or-degraded link should skip the rest
        # quickly rather than burn each item's full timeout producing garbage
        if i > 1:
            ok, took = probe(probe_timeout_s)
            log(out_dir, f"inter-item probe: ok={ok} {took:.1f}s")
            if not ok or took >= 60:
                log(out_dir, f"tunnel relapsed before {name}; skipping the rest")
                return
        env = dict(os.environ, **extra_env)
        env.pop("JAX_PLATFORMS", None)  # battery items measure the TPU
        log_path = os.path.join(out_dir, f"{i:02d}_{name}.log")
        log(out_dir, f"running {name} (timeout {timeout_s}s) -> {log_path}")
        t0 = time.perf_counter()
        try:
            with open(log_path, "w") as f:
                rc = subprocess.run(argv, timeout=timeout_s, cwd=REPO, env=env,
                                    stdout=f, stderr=subprocess.STDOUT).returncode
            log(out_dir, f"{name}: rc={rc} in {time.perf_counter() - t0:.0f}s")
        except subprocess.TimeoutExpired:
            log(out_dir, f"{name}: TIMEOUT after {timeout_s}s")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, ".tpuwatch"))
    ap.add_argument("--deadline-s", type=float, default=10 * 3600)
    ap.add_argument("--poll-s", type=float, default=300)
    ap.add_argument("--probe-timeout-s", type=float, default=120)
    ap.add_argument("--battery", default=DEFAULT_BATTERY,
                    help="comma list of registry items to run, in order")
    args = ap.parse_args()

    battery = []
    names = [n.strip() for n in args.battery.split(",") if n.strip()]
    unknown = [n for n in names if n not in BATTERY_REGISTRY]
    if unknown:
        # fail usably at launch: this script typically runs detached for
        # hours — a raw KeyError would only surface in an empty log later
        print("unknown battery item(s) {}; have {}".format(
            unknown, sorted(BATTERY_REGISTRY)), file=sys.stderr)
        return 2
    for name in names:
        argv, timeout_s, extra_env = BATTERY_REGISTRY[name]
        battery.append((name, argv, timeout_s, extra_env))

    os.makedirs(args.out, exist_ok=True)
    t_end = time.monotonic() + args.deadline_s
    log(args.out, f"watching for a healthy tunnel (deadline {args.deadline_s:.0f}s, "
                  f"poll {args.poll_s:.0f}s)")
    while time.monotonic() < t_end:
        ok, took = probe(args.probe_timeout_s)
        log(args.out, f"probe: ok={ok} {took:.1f}s")
        if ok and took < 60:
            # double-check: one healthy probe after a long outage can be a
            # blip; require two in a row before spending the battery
            ok2, took2 = probe(args.probe_timeout_s)
            log(args.out, f"confirm probe: ok={ok2} {took2:.1f}s")
            if ok2 and took2 < 60:
                log(args.out, "tunnel healthy; running battery "
                    + ",".join(n for n, *_ in battery))
                run_battery(args.out, args.probe_timeout_s, battery)
                log(args.out, "battery done")
                return 0
        time.sleep(args.poll_s)
    log(args.out, "deadline passed with no healthy window")
    return 2


if __name__ == "__main__":
    sys.exit(main())
