"""Live 2-process ``jax.distributed`` dryrun — the pod recipe, actually run.

`multihost.py` documents the pod launch recipe (per-host loaders with
``data_shard=(i, n)``, ``jax.make_array_from_process_local_data``, a global
mesh, one jitted step). This module EXECUTES that recipe with real separate
processes on CPU devices (XLA's Gloo collectives carry the cross-process
reductions), so coordinator handshake, global device enumeration, per-host
array assembly and cross-process collectives are all exercised without a
pod — and gates the result on equality with a single-process run of the same
global batch (the same guarantee tests/test_parallel.py proves across
devices, extended across PROCESSES).

Topology: ``num_processes`` host processes x ``local_devices`` virtual CPU
devices each; the single-process oracle runs the identical global mesh
(``num_processes * local_devices`` devices) in one process, feeding the
concatenation of every host's loader shard. Losses per step AND the final
param/state fingerprint must match to fp32 tolerance.

Run directly:  ``python -m dorknet_tpu.parallel.multihost_dryrun``
From code/tests:  ``run_dryrun(num_processes=2)``
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# tiny-but-real shapes: the full flagship architecture (every stride/skip),
# CPU-friendly sizes
_IMAGE = 32
_PRECROP = 40
_GLOBAL_BATCH = 16
_CLASSES = 2
_STEPS = 3
_LR = 0.001


def _build_tree(root, n_per_class=12):
    """Deterministic synthetic <class>/images/* tree (channel-intensity
    class signal — survives GAP, CLAUDE.md gotcha)."""
    import cv2
    import numpy as np

    rng = np.random.RandomState(0)
    for cls in range(_CLASSES):
        d = os.path.join(root, "class{}".format(cls), "images")
        os.makedirs(d)
        for i in range(n_per_class):
            im = rng.randint(0, 200, (48, 48, 3), dtype=np.uint8)
            im[:, :, cls] = np.clip(im[:, :, cls] + 55, 0, 255)
            cv2.imwrite(os.path.join(d, "{}.png".format(i)), im)


def _shard_batches(tree, shard, batch, steps):
    """What one host's loader feeds: ``steps`` deterministic (X, one_hot)
    draws from its disjoint ``data_shard`` file stripe (center crop, flat
    sampling, single worker — no RNG on this path)."""
    from dorknet_tpu.data_loading import ImageDataLoader, ImagePreprocessor

    pp = ImagePreprocessor((_IMAGE, _IMAGE), crop_mode="center",
                           precrop_size=(_PRECROP, _PRECROP))
    loader = ImageDataLoader(tree, batch_size=batch, preprocessor=pp,
                             class_balance=False, num_workers=1,
                             data_shard=shard)
    try:
        return [(X, oh) for X, _, oh in loader.pull_batch(steps)]
    finally:
        loader.stop_thread()


def _train(batches, mesh_devices, batch_sharding_spec=True):
    """Seed, build the flagship, run the shared step loop over already-global
    (or single-process) batches. Returns (losses, fingerprint)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from dorknet_tpu.models import ResNet18
    from dorknet_tpu.network import Trainer
    from dorknet_tpu.optimisers import SGDMomentum
    from dorknet_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh({"data": mesh_devices})
    sh = batch_sharding(mesh)
    np.random.seed(0)
    net = ResNet18("mh-dryrun", num_classes=_CLASSES)
    trainer = Trainer(net, SGDMomentum(net, _LR, 0.9), batch_sharding=sh)
    losses = []
    for X, oh in batches:
        loss, _ = trainer.step(X, oh)
        losses.append(float(jax.device_get(loss)))
    leaves = (jax.tree_util.tree_leaves(net.gather_params())
              + jax.tree_util.tree_leaves(net.gather_states()))
    fp = float(sum(float(jax.device_get(jnp.sum(jnp.abs(jnp.asarray(l)))))
                   for l in leaves))
    return losses, fp, sh


def _worker_main(argv):
    """One simulated pod host. Env (JAX_PLATFORMS=cpu + virtual device
    count) is set by the parent BEFORE this interpreter started."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--tree", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from dorknet_tpu.parallel import multihost

    n, pid = multihost.initialize(args.coordinator, args.num_processes,
                                  args.process_id)
    assert (n, pid) == (args.num_processes, args.process_id), (n, pid)

    # the pod recipe, verbatim: per-host disjoint loader shard -> local rows
    # -> make_array_from_process_local_data -> global jitted step
    start, per = multihost.local_batch_slice(_GLOBAL_BATCH)
    local = _shard_batches(args.tree, (pid, n), per, _STEPS)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dorknet_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh({"data": jax.device_count()})
    sh = batch_sharding(mesh)
    sh2 = NamedSharding(mesh, P("data"))

    def to_global(X, oh):
        X = np.ascontiguousarray(X, dtype=np.float32)
        oh = np.ascontiguousarray(oh, dtype=np.float32)
        Xg = jax.make_array_from_process_local_data(
            sh, X, global_shape=(_GLOBAL_BATCH,) + X.shape[1:])
        ohg = jax.make_array_from_process_local_data(
            sh2, oh, global_shape=(_GLOBAL_BATCH,) + oh.shape[1:])
        return Xg, ohg

    batches = [to_global(X, oh) for X, oh in local]
    losses, fp, _ = _train(batches, jax.device_count())
    with open(args.out, "w") as f:
        json.dump({"process_id": pid, "losses": losses,
                   "fingerprint": fp,
                   "global_devices": jax.device_count(),
                   "local_devices": jax.local_device_count()}, f)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _oracle_main(argv):
    """Single-process oracle: same global mesh size in ONE process, fed the
    concatenation of every host's shard draws."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--tree", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    n = args.num_processes
    per = _GLOBAL_BATCH // n
    shards = [_shard_batches(args.tree, (pid, n), per, _STEPS)
              for pid in range(n)]
    batches = [(np.concatenate([shards[pid][s][0] for pid in range(n)]),
                np.concatenate([shards[pid][s][1] for pid in range(n)]))
               for s in range(_STEPS)]
    losses, fp, _ = _train(batches, jax.device_count())
    with open(args.out, "w") as f:
        json.dump({"losses": losses, "fingerprint": fp,
                   "global_devices": jax.device_count()}, f)


def _spawn(extra_args, local_devices, log_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # inherited flags (e.g. the test conftest's 8-device count) must not
    # override ours — ours goes LAST, and any prior device-count flag is
    # dropped
    inherited = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        inherited + ["--xla_force_host_platform_device_count={}".format(
            local_devices)])
    env["PYTHONPATH"] = _REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    # keep child BLAS/XLA thread pools small: 3 jax processes share one host
    env.setdefault("OMP_NUM_THREADS", "1")
    log = open(log_path, "w")
    return subprocess.Popen(
        [sys.executable, "-m", "dorknet_tpu.parallel.multihost_dryrun"]
        + extra_args, env=env, cwd=_REPO_ROOT, stdout=log, stderr=log), log


def run_dryrun(num_processes=2, local_devices=2, timeout=900):
    """Spawn the workers + oracle, gate equality. Returns the merged report
    dict; raises AssertionError on any mismatch."""
    import numpy as np

    tmp = tempfile.mkdtemp(prefix="dorknet_mh_")
    tree = os.path.join(tmp, "tree")
    os.makedirs(tree)
    _build_tree(tree)
    coordinator = "localhost:{}".format(_free_port())

    procs = []
    try:
        outs = []
        for pid in range(num_processes):
            out = os.path.join(tmp, "worker{}.json".format(pid))
            outs.append(out)
            procs.append(_spawn(
                ["--worker", "--coordinator", coordinator,
                 "--num-processes", str(num_processes),
                 "--process-id", str(pid), "--tree", tree, "--out", out],
                local_devices, os.path.join(tmp, "worker{}.log".format(pid))))
        oracle_out = os.path.join(tmp, "oracle.json")
        procs.append(_spawn(
            ["--oracle", "--num-processes", str(num_processes),
             "--tree", tree, "--out", oracle_out],
            num_processes * local_devices, os.path.join(tmp, "oracle.log")))
        for p, log in procs:
            rc = p.wait(timeout=timeout)
            log.close()
            if rc != 0:
                raise AssertionError(
                    "multihost dryrun subprocess failed (rc={}):\n{}".format(
                        rc, open(log.name).read()[-4000:]))
        workers = [json.load(open(o)) for o in outs]
        oracle = json.load(open(oracle_out))
    finally:
        for p, log in procs:
            if p.poll() is None:
                p.kill()
            log.close()

    want_devices = num_processes * local_devices
    for w in workers:
        assert w["global_devices"] == want_devices, w
        assert w["local_devices"] == local_devices, w
        # every process observes the same global losses/params (they are
        # replicated outputs of one SPMD program)
        np.testing.assert_allclose(w["losses"], workers[0]["losses"],
                                   rtol=1e-6)
        np.testing.assert_allclose(w["fingerprint"],
                                   workers[0]["fingerprint"], rtol=1e-6)
    # ... and they equal the single-process run of the same global batches:
    # distribution changed nothing but where the rows came from
    np.testing.assert_allclose(workers[0]["losses"], oracle["losses"],
                               rtol=2e-5)
    np.testing.assert_allclose(workers[0]["fingerprint"],
                               oracle["fingerprint"], rtol=2e-5)
    return {"processes": num_processes, "local_devices": local_devices,
            "losses": workers[0]["losses"],
            "oracle_losses": oracle["losses"],
            "fingerprint": workers[0]["fingerprint"],
            "oracle_fingerprint": oracle["fingerprint"], "ok": True}


def main():
    argv = sys.argv[1:]
    if "--worker" in argv:
        argv.remove("--worker")
        _worker_main(argv)
    elif "--oracle" in argv:
        argv.remove("--oracle")
        _oracle_main(argv)
    else:
        report = run_dryrun()
        print(json.dumps(report))


if __name__ == "__main__":
    main()
