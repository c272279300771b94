"""Executed convergence evidence at dogs scale (VERDICT r4 item 4).

The reference's one quality number — 0.686 top-1 on ImageNet-dogs
(reference examples/imagenet_dogs_225_resnet_18_depsep_CAM.py:59) — is not
reproducible here (no dataset on disk), so this script is the strongest
executable proxy: a 120-class 225px synthetic dataset with a
GAP-survivable class signal, trained on the REAL chip through the full
shipping pipeline (packed dataset → HBM-resident loader → fused
gather+aug+mixup+train dispatches → periodic held-out validation), with
the loss/accuracy trajectory written to artifacts/.

Class signal (CLAUDE.md recipe: intensity/texture, never spatial
position): each class k gets a fixed random per-channel BGR offset, plus a
sinusoidal grating with class-specific frequency/orientation — both
survive GlobalAveragePooling, random crops, flips, ±15° rotation and the
HSV augmentation (gratings are invariant to intensity scaling; offsets
survive in channel ratios). Per-instance phase + noise make rows distinct.

Hyperparameters mirror examples/imagenet_dogs_225_resnet_18_depsep.py:
SGDMomentum lr 0.05*(B/200) m 0.9, mixup (0, 0.3), the dogs AUG_CFG, bf16
policy, lr ×0.5 at 60%/80% of the step budget (the example's staircase,
compressed). The CI replay (tests/test_dogs_example_scripts.py) runs a
shrunk config on CPU and asserts the trajectory improves.

Usage: python -m scripts.train_synth_dogs [--steps 400] [--out artifacts/round5]
Env overrides (CI): SYNTH_CLASSES/SYNTH_PER_CLASS/SYNTH_VAL_PER_CLASS/
SYNTH_IMAGE/SYNTH_BATCH.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

CLASSES = int(os.environ.get("SYNTH_CLASSES", "120"))
PER_CLASS = int(os.environ.get("SYNTH_PER_CLASS", "8"))
VAL_PER_CLASS = int(os.environ.get("SYNTH_VAL_PER_CLASS", "3"))
IMAGE = int(os.environ.get("SYNTH_IMAGE", "225"))
BATCH = int(os.environ.get("SYNTH_BATCH", "128"))

AUG_CFG = dict(hsv_pert_tuples=((0.9, 1.1), (0.5, 2.0), (0.5, 2.0)),
               rotation_tuple=(-15.0, 15.0), horizontal_flip_prob=0.5,
               crop_mode="random", mixup=(0.0, 0.3))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _class_params(cls):
    rs = np.random.RandomState(1000 + cls)
    return dict(
        offsets=rs.uniform(-45.0, 45.0, size=3),
        freq=rs.uniform(0.04, 0.45),
        theta=rs.uniform(0.0, np.pi),
        amp=rs.uniform(20.0, 40.0),
    )


def _make_class_rows(cls, n, hw, seed):
    """(n, h, w, 3) uint8 rows for one class (vectorised numpy)."""
    p = _class_params(cls)
    rs = np.random.RandomState(seed)
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u = xx * np.cos(p["theta"]) + yy * np.sin(p["theta"])
    phase = rs.uniform(0, 2 * np.pi, size=n).astype(np.float32)
    g = np.sin(2 * np.pi * p["freq"] * u[None] + phase[:, None, None])
    img = (128.0 + p["offsets"][None, None, None, :]
           + p["amp"] * g[..., None]
           + rs.normal(0, 18.0, size=(n, h, w, 3)).astype(np.float32))
    return np.clip(img, 0, 255).astype(np.uint8)


def write_synth_packed(out_dir, classes, per_class, precrop, seed_base=0):
    """A packed-format directory (packed_dataset.py schema) of synthetic
    rows — same on-disk contract as scripts/pack_dataset.py output, so the
    loaders treat it exactly like a packed real dataset."""
    from dorknet_tpu.data_loading.packed_dataset import (PACKED_FORMAT,
                                                         PACKED_META)

    os.makedirs(out_dir, exist_ok=True)
    n = classes * per_class
    images = np.lib.format.open_memmap(
        os.path.join(out_dir, "images.npy"), mode="w+",
        dtype=np.uint8, shape=(n, precrop, precrop, 3))
    labels = np.empty((n,), np.int32)
    names = ["class%03d" % c for c in range(classes)]
    paths = []
    for c in range(classes):
        rows = _make_class_rows(c, per_class, (precrop, precrop),
                                seed_base + c)
        images[c * per_class:(c + 1) * per_class] = rows
        labels[c * per_class:(c + 1) * per_class] = c
        paths += ["%s/images/%04d.synth" % (names[c], i)
                  for i in range(per_class)]
    images.flush()
    del images
    np.save(os.path.join(out_dir, "labels.npy"), labels)
    with open(os.path.join(out_dir, PACKED_META), "w") as f:
        json.dump({"format": PACKED_FORMAT,
                   "precrop": [precrop, precrop],
                   "class_names": names, "paths": paths,
                   "source": "synthetic"}, f)
    return n


def run(steps, out_dir, eval_every=None, log_every=10, cam_out=None):
    import dorknet_tpu
    from dorknet_tpu.data_loading import DeviceResidentDataset
    from dorknet_tpu.models import ResNet18
    from dorknet_tpu.network import Trainer
    from dorknet_tpu.optimisers import SGDMomentum

    precrop = int(IMAGE * 1.25)
    eval_every = eval_every or max(10, steps // 10)
    tmp = tempfile.mkdtemp(prefix="synth_dogs_")
    train_dir, val_dir = tmp + "/train", tmp + "/val"
    t0 = time.perf_counter()
    write_synth_packed(train_dir, CLASSES, PER_CLASS, precrop, seed_base=0)
    write_synth_packed(val_dir, CLASSES, VAL_PER_CLASS, precrop,
                       seed_base=10_000_000)  # disjoint instance seeds
    log(f"synth packed dirs written ({time.perf_counter() - t0:.1f}s): "
        f"{CLASSES} classes x {PER_CLASS} train / {VAL_PER_CLASS} val "
        f"@ {precrop}px")

    np.random.seed(0)
    dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    try:
        net = ResNet18("synth-dogs", num_classes=CLASSES)
        lr = 0.05 * (BATCH / 200.0)  # the dogs example's batch-scaled lr
        opt = SGDMomentum(net, lr, 0.9)
        trainer = Trainer(net, opt, input_layout="NHWC")

        t0 = time.perf_counter()
        dd = DeviceResidentDataset(train_dir, batch_size=BATCH,
                                   class_balance=True, log=log)
        log(f"train upload: {dd.images.nbytes / 1e6:.0f} MB in "
            f"{time.perf_counter() - t0:.1f}s")
        from dorknet_tpu.data_loading.packed_dataset import PackedDataset
        vp = PackedDataset(val_dir)
        Xv = jax.device_put(np.asarray(vp.images))
        np.asarray(Xv[0, 0, 0])  # sync
        yv = vp.labels

        off = (precrop - IMAGE) // 2

        @jax.jit
        def _val_logits(params, states, xu8):
            x = xu8[:, off:off + IMAGE, off:off + IMAGE, :]
            x = x.astype(jnp.float32) - 128.0   # the preprocessor contract
            x = jnp.transpose(x, (0, 3, 1, 2))  # public NCHW boundary
            return net._test_fn(params, states, x)

        def val_acc():
            params, states = net.gather_params(), net.gather_states()
            correct = 0
            vb = min(len(yv), 240)
            for s in range(0, len(yv), vb):
                pred = jnp.argmax(_val_logits(params, states,
                                              Xv[s:s + vb]), axis=1)
                correct += int(np.sum(np.asarray(pred) == yv[s:s + vb]))
            return correct / len(yv)

        traj = []
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        for step in range(1, steps + 1):
            # the example's lr staircase, compressed to the step budget
            if step in (int(steps * 0.6), int(steps * 0.8)):
                opt.multiply_learning_rate(0.5)
            key, k = jax.random.split(key)
            loss, _ = trainer.step_augmented_indexed(
                k, dd.images, dd.labels, dd.next_indices(), (IMAGE, IMAGE),
                dd.num_classes, **AUG_CFG)
            if step % log_every == 0 or step == 1 or step == steps:
                loss = float(loss)  # hard sync
                rec = {"step": step, "loss": round(loss, 4),
                       "wall_s": round(time.perf_counter() - t0, 1)}
                if step % eval_every == 0 or step == steps:
                    rec["val_acc"] = round(val_acc(), 4)
                traj.append(rec)
                log(rec)

        os.makedirs(out_dir, exist_ok=True)
        cam_dirs = []
        if cam_out:
            # CAM overlays from THIS genuinely-trained 120-class network on
            # held-out images — the executable stand-in for the reference's
            # released-checkpoint CAM gallery
            # (/root/reference/CAM_images/0_Bouvier_des_Flandres.png), via
            # the CAM example's own run_one (same code path a user runs).
            import cv2
            from examples.imagenet_dogs_225_resnet_18_depsep_CAM import \
                run_one
            from dorknet_tpu.data_loading import ImagePreprocessor

            pp = ImagePreprocessor(image_size=(IMAGE, IMAGE),
                                   crop_mode="center")
            names = {str(i): n for i, n in enumerate(dd.class_names)}
            img_dir = os.path.join(tmp, "photos")
            os.makedirs(img_dir)
            for j in (0, len(yv) // 2, len(yv) - 1):
                fname = "val%03d_true_class%03d.png" % (j, yv[j])
                cv2.imwrite(os.path.join(img_dir, fname),
                            np.asarray(vp.images[j]))
                dst = os.path.join(cam_out, os.path.splitext(fname)[0])
                run_one(net, pp, names, os.path.join(img_dir, fname), dst)
                cam_dirs.append(dst)
            log("CAM overlays written: {}".format(cam_dirs))

        traj_path = os.path.join(out_dir, "synth_dogs_trajectory.jsonl")
        with open(traj_path, "w") as f:
            for rec in traj:
                f.write(json.dumps(rec) + "\n")
        summary = {
            "classes": CLASSES, "image": IMAGE, "batch": BATCH,
            "steps": steps, "backend": jax.default_backend(),
            "first_loss": traj[0]["loss"], "final_loss": traj[-1]["loss"],
            "final_val_acc": traj[-1].get("val_acc"),
            "chance": round(1.0 / CLASSES, 4),
            "trajectory": traj_path,
            "cam_dirs": cam_dirs,
        }
        print(json.dumps(summary))
        return summary
    finally:
        dorknet_tpu.set_compute_dtype(jnp.float32)
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", default="artifacts/round5")
    ap.add_argument("--eval-every", type=int, default=None)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--cam-out", default=None,
                    help="write 3 held-out CAM overlay galleries here")
    args = ap.parse_args()
    run(args.steps, args.out, eval_every=args.eval_every,
        log_every=args.log_every, cam_out=args.cam_out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
