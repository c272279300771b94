"""The three flagship example scripts' ACTUAL __main__ bodies run end-to-end
(VERDICT r2 item 5 / coverage #34-36): training (host-augment + mixup path,
then restart-from-checkpoint with on-device augmentation), CAM overlays, and
evaluate (--verify --int8) — all against a synthetic DORKNET_DATA tree laid
out exactly like the reference's ImageNet-dogs directory structure
(<class>/images/*.jpg, reference examples/imagenet_dogs_225_resnet_18_depsep.py:162-244).

Ordering: the training test produces the checkpoint the CAM/evaluate tests
load; pytest executes this file top-to-bottom.
"""

import glob
import json
import logging
import os
import runpy
import sys

import cv2
import numpy as np
import pytest

# Every test here runs a script __main__ / subprocess — the slow tier.
pytestmark = pytest.mark.slow

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CLASSES = 120  # ResNet18's classifier width — the tree must match
IMG = 40

# state handed from the training test to the CAM/evaluate tests
_produced = {}


@pytest.fixture(scope="module")
def dogs_env(tmp_path_factory):
    """Synthetic dataset tree + env knobs + cwd for the scripts' relative
    paths; restores everything afterwards."""
    root = tmp_path_factory.mktemp("dogs_e2e")
    data = root / "data"
    rng = np.random.RandomState(0)
    for split, n in (("train_img", 2), ("val_img", 1)):
        for c in range(N_CLASSES):
            d = (data / "ImageNet2012" / "ILSVRC2012_dogs" / split /
                 "class_{:03d}".format(c) / "images")
            d.mkdir(parents=True)
            for i in range(n):
                im = rng.randint(0, 255, (56, 56, 3), dtype=np.uint8)
                cv2.imwrite(str(d / "{}.jpg".format(i)), im)
    (root / "dog_images").mkdir()
    for i in range(2):
        im = rng.randint(0, 255, (80, 90, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "dog_images" / "dog{}.jpg".format(i)), im)

    env = {
        "DORKNET_DATA": str(data),
        "DORKNET_BATCH": "16",
        "DORKNET_IMAGE": str(IMG),
        "DORKNET_EPOCHS": "2",        # range(1, 2) -> one epoch
        "DORKNET_TRAIN_SIZE": "32",   # 2 train steps per epoch
        "DORKNET_VAL_SIZE": "32",     # 2 val batches
        "DORKNET_WORKERS": "2",
        "DORKNET_EXPERIMENT": "CITinyDogs",
        "DORKNET_CLASS_MAP": os.path.join(
            REPO_ROOT, "imagenet_dog_class_names/num_to_dog_name_map.json"),
    }
    old_cwd = os.getcwd()
    old_env = {k: os.environ.get(k) for k in env}
    old_handlers = logging.getLogger().handlers[:]
    os.chdir(root)
    os.environ.update(env)
    try:
        yield root
    finally:
        os.chdir(old_cwd)
        for k, v in old_env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        for h in logging.getLogger().handlers[:]:
            if h not in old_handlers:
                logging.getLogger().removeHandler(h)
                h.close()


def _run(module, argv=None):
    old_argv = sys.argv
    sys.argv = argv or [module]
    try:
        runpy.run_module(module, run_name="__main__")
    finally:
        sys.argv = old_argv


def test_training_script_runs_main_body(dogs_env):
    """The reference training flow executes verbatim: loaders + augmenter +
    mixup, fused train steps, per-epoch validation, accuracy-stamped h5 save."""
    _run("examples.imagenet_dogs_225_resnet_18_depsep")

    exp = dogs_env / "CITinyDogs"
    assert (exp / "CITinyDogs.json").exists()
    ckpts = sorted(glob.glob(str(exp / "epoch_1_testacc_*.h5")))
    assert ckpts, "no accuracy-stamped checkpoint saved"
    _produced["ckpt"] = os.path.basename(ckpts[0])
    # the stamped accuracy parses and is a probability
    acc = float(_produced["ckpt"].split("testacc_")[1][:-3])
    assert 0.0 <= acc <= 1.0
    with open(exp / "CITinyDogs.json") as f:
        # name + 17 top-level layers + loss (composite blocks nest in reprs)
        assert len(json.load(f)) >= 18
    # the machine-readable metrics sidecar parses and carries the epoch record
    from dorknet_tpu.utils.metrics import read_metrics

    recs = read_metrics(str(dogs_env / "logging" /
                            "CITinyDogs.metrics.jsonl"))
    assert any("test_acc" in r for r in recs)
    assert any("loss" in r for r in recs)


def test_training_script_restart_with_on_device_augment(dogs_env):
    """The restart flow (reference :184-199) + ON_DEVICE_AUGMENT: resume from
    the epoch-1 checkpoint and train another epoch with the augmentation
    stack as one jitted device program."""
    assert "ckpt" in _produced, "training test must run first"
    os.environ["DORKNET_RESTART_CKPT"] = _produced["ckpt"]
    os.environ["DORKNET_START_EPOCH"] = "1"
    os.environ["DORKNET_ON_DEVICE_AUGMENT"] = "1"
    try:
        _run("examples.imagenet_dogs_225_resnet_18_depsep")
    finally:
        for k in ("DORKNET_RESTART_CKPT", "DORKNET_START_EPOCH",
                  "DORKNET_ON_DEVICE_AUGMENT"):
            os.environ.pop(k, None)
    # the restart run overwrote/added its own epoch-1 checkpoint
    assert glob.glob(str(dogs_env / "CITinyDogs" / "epoch_1_testacc_*.h5"))


def test_training_script_device_resident_mode(dogs_env):
    """DORKNET_DEVICE_RESIDENT=1: the script auto-packs the JPEG tree on
    first run, uploads it once (DeviceResidentDataset), and trains via
    step_augmented_indexed — the HBM-resident fast path, end-to-end through
    the same __main__ (restart from the epoch-1 checkpoint)."""
    assert "ckpt" in _produced, "training test must run first"
    os.environ["DORKNET_RESTART_CKPT"] = _produced["ckpt"]
    os.environ["DORKNET_START_EPOCH"] = "1"
    os.environ["DORKNET_DEVICE_RESIDENT"] = "1"
    try:
        _run("examples.imagenet_dogs_225_resnet_18_depsep")
    finally:
        for k in ("DORKNET_RESTART_CKPT", "DORKNET_START_EPOCH",
                  "DORKNET_DEVICE_RESIDENT"):
            os.environ.pop(k, None)
    assert glob.glob(str(dogs_env / "CITinyDogs" / "epoch_1_testacc_*.h5"))
    # the one-time pack landed next to the source tree and is reused
    packed = (dogs_env / "data" / "ImageNet2012" / "ILSVRC2012_dogs" /
              "train_img_packed")
    assert (packed / "packed_meta.json").exists()
    # metrics sidecar records the mode
    mfile = dogs_env / "logging" / "CITinyDogs.metrics.jsonl"
    recs = [json.loads(l) for l in open(mfile)]
    assert any(r.get("device_resident") for r in recs)


def test_training_script_device_resident_hbm_fallback(dogs_env):
    """DORKNET_DEVICE_RESIDENT=1 with a dataset that exceeds the HBM budget
    (forced tiny via DORKNET_HBM_BUDGET): the script must fall back to the
    streaming packed loader + on-device augment instead of OOMing
    mid-upload — the metrics sidecar records the EFFECTIVE mode."""
    assert "ckpt" in _produced, "training test must run first"
    os.environ["DORKNET_RESTART_CKPT"] = _produced["ckpt"]
    os.environ["DORKNET_START_EPOCH"] = "1"
    os.environ["DORKNET_DEVICE_RESIDENT"] = "1"
    os.environ["DORKNET_HBM_BUDGET"] = "1024"  # 1 KB: nothing fits
    try:
        _run("examples.imagenet_dogs_225_resnet_18_depsep")
    finally:
        for k in ("DORKNET_RESTART_CKPT", "DORKNET_START_EPOCH",
                  "DORKNET_DEVICE_RESIDENT", "DORKNET_HBM_BUDGET"):
            os.environ.pop(k, None)
    assert glob.glob(str(dogs_env / "CITinyDogs" / "epoch_1_testacc_*.h5"))
    mfile = dogs_env / "logging" / "CITinyDogs.metrics.jsonl"
    recs = [json.loads(l) for l in open(mfile)]
    # the LAST bind must show the fallback took effect
    binds = [r for r in recs if "device_resident" in r]
    assert binds and not binds[-1]["device_resident"]
    assert binds[-1]["on_device_augment"]


def test_cam_script_writes_overlays(dogs_env):
    """The CAM example's __main__: load checkpoint, top-3 CAM overlays per
    image in dog_images/ (the reference's CAM_images/ outputs)."""
    assert "ckpt" in _produced, "training test must run first"
    os.environ["DORKNET_CHECKPOINT"] = _produced["ckpt"]
    try:
        _run("examples.imagenet_dogs_225_resnet_18_depsep_CAM")
    finally:
        os.environ.pop("DORKNET_CHECKPOINT", None)
    for i in range(2):
        outs = glob.glob(str(dogs_env / "CAM_outputs" / "dog{}".format(i) /
                             "*.png"))
        assert len(outs) == 3, outs
        im = cv2.imread(outs[0])
        assert im is not None and im.shape == (IMG, IMG, 3)
        # overlay names carry the ranked class names from the shipped map
        assert any(not c.isdigit() for c in os.path.basename(outs[0])[2:-4])


def test_cam_script_gradcam_mode(dogs_env):
    """DORKNET_GRADCAM=1 runs the same __main__ with Grad-CAM maps (same
    output contract: 3 ranked overlays per image)."""
    assert "ckpt" in _produced, "training test must run first"
    os.environ["DORKNET_CHECKPOINT"] = _produced["ckpt"]
    os.environ["DORKNET_GRADCAM"] = "1"
    os.environ["DORKNET_CAM_OUT"] = str(dogs_env / "GradCAM_outputs")
    try:
        _run("examples.imagenet_dogs_225_resnet_18_depsep_CAM")
    finally:
        os.environ.pop("DORKNET_CHECKPOINT", None)
        os.environ.pop("DORKNET_GRADCAM", None)
        os.environ.pop("DORKNET_CAM_OUT", None)
    for i in range(2):
        outs = glob.glob(str(dogs_env / "GradCAM_outputs" /
                             "dog{}".format(i) / "*.png"))
        assert len(outs) == 3, outs
        im = cv2.imread(outs[0])
        assert im is not None and im.shape == (IMG, IMG, 3)


def test_evaluate_script_verify_int8(dogs_env, capsys):
    """The evaluate example's __main__ with --verify --int8: int8 serving over
    the val loader + top-5 annotated prediction images."""
    assert "ckpt" in _produced, "training test must run first"
    os.environ["DORKNET_CHECKPOINT"] = _produced["ckpt"]
    try:
        _run("examples.imagenet_dogs_225_resnet_18_depsep_evaluate",
             argv=["evaluate", "--verify", "--int8"])
    finally:
        os.environ.pop("DORKNET_CHECKPOINT", None)
    out = capsys.readouterr().out
    assert "Test acc:" in out
    for i in range(2):
        ann = dogs_env / "dog_images" / "outputs" / "dog{}.jpg".format(i)
        assert ann.exists()
        assert cv2.imread(str(ann)) is not None


def test_synth_dogs_convergence_replay(tmp_path):
    """Shrunk replay of scripts/train_synth_dogs (the dogs-scale convergence
    evidence run, REPRO.md §8): the same pipeline — synthetic packed dirs ->
    HBM-resident dataset -> fused gather+aug+mixup+train -> held-out val —
    must improve monotonically-ish on CPU in 30 steps and write the
    trajectory artifact."""
    import importlib

    env = {"SYNTH_CLASSES": "6", "SYNTH_PER_CLASS": "6",
           "SYNTH_VAL_PER_CLASS": "3", "SYNTH_IMAGE": "36",
           "SYNTH_BATCH": "12"}
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        import scripts.train_synth_dogs as tsd
        importlib.reload(tsd)  # re-read the env knobs
        summary = tsd.run(steps=30, out_dir=str(tmp_path), eval_every=15,
                          log_every=5)
    finally:
        for k, v in old.items():
            os.environ.pop(k, None) if v is None else os.environ.update({k: v})
        importlib.reload(tsd)
    assert summary["final_loss"] < 0.75 * summary["first_loss"]
    assert summary["final_val_acc"] >= summary["chance"]
    lines = [json.loads(l) for l in
             open(tmp_path / "synth_dogs_trajectory.jsonl")]
    assert lines[-1]["step"] == 30 and "val_acc" in lines[-1]
