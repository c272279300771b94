"""Checkpoint interchange against the REAL reference implementation.

The goldens in tests/goldens/ref_interop/ were produced by the reference's
own h5+json writers (ref network/feed_forward_network.py:90-104) running on
NumPy kernel stubs — see tests/ref_interop/run_reference.py. Layer coverage:
Conv(+l2), BN, ReLu, ResidualBlock (depthwise + BN + ReLu + strided
pointwise inner list, strided pointwise skip projection), GAP, Dense,
Softmax-CE — every type in the reference's load dispatch (:106-139).

Two directions:
  ref -> ours  : committed goldens, always runs.
  ours -> ref  : live subprocess loading OUR h5+json with the REFERENCE
                 loader (needs /root/reference; skipped when absent).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from dorknet_tpu.network import FeedForwardNetwork

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_DIR = os.path.join(HERE, "goldens", "ref_interop")
RUNNER = os.path.join(HERE, "ref_interop", "run_reference.py")
REFERENCE = os.environ.get("DORKNET_REFERENCE", "/root/reference")


def _run_reference(*args, cwd):
    """Subprocess with a clean import path: the reference uses the same
    top-level package names (layers, network, ...) as this repo's compat
    shims, so it must never see the repo root on sys.path."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    return subprocess.run([sys.executable, RUNNER, *args], cwd=cwd, env=env,
                          capture_output=True, text=True, check=True)


def _load_golden_net():
    net = FeedForwardNetwork("interop")
    net.load_network_from_json_and_h5(
        os.path.join(GOLDEN_DIR, "ref_structure.json"),
        os.path.join(GOLDEN_DIR, "ref_weights.h5"))
    return net, np.load(os.path.join(GOLDEN_DIR, "golden.npz"))


def test_reference_checkpoint_loads_and_matches_forward():
    """ref -> ours: test-mode scores, feature tap, and train-mode loss all
    reproduce the reference's recorded outputs within fp32 tolerance."""
    net, g = _load_golden_net()

    _, probs = net.forward(g["X"], g["y"], test_mode=True)
    np.testing.assert_allclose(np.asarray(probs), g["test_probs"],
                               rtol=1e-5, atol=1e-6)

    _, tap = net.forward(g["X"], g["y"], test_mode=True,
                         terminal_layer_name="relu1")
    np.testing.assert_allclose(np.asarray(tap), g["tap_relu1"],
                               rtol=1e-5, atol=1e-5)

    # Train mode re-adopts batch stats exactly as the reference did on the
    # same batch (both nets start from the same post-batch running stats,
    # but train-mode normalisation uses the CURRENT batch, so this pins the
    # whole train-forward numerics including the l2 term).
    loss, tprobs = net.forward(g["X"], g["y"], test_mode=False)
    np.testing.assert_allclose(float(loss), float(g["train_loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(tprobs), g["train_probs"],
                               rtol=1e-5, atol=1e-6)


def test_reference_grads_present_in_golden():
    """The reference writer stores grads unconditionally; assert our loader
    surfaced them (schema depth check, ref convolution.py:249-258)."""
    import h5py

    with h5py.File(os.path.join(GOLDEN_DIR, "ref_weights.h5"), "r") as f:
        assert "conv1/grads/weights" in f
        # the composite block saves its children as flat top-level groups
        assert "res1_dw/grads/weights" in f
        assert f["conv1/weights"].attrs["weight_regulariser_type"] in (
            b"l2", "l2")


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not available")
def test_our_checkpoint_loads_in_reference(tmp_path):
    """ours -> ref: the reference's own loader consumes files written by
    OUR writers and reproduces our test-mode scores."""
    net, g = _load_golden_net()
    ours_h5 = str(tmp_path / "ours.h5")
    ours_json = str(tmp_path / "ours.json")
    net.save_weights_to_h5(ours_h5)
    net.save_layer_structure_to_json(ours_json)

    out_npz = str(tmp_path / "ref_out.npz")
    _run_reference("consume", ours_json, ours_h5,
                   os.path.join(GOLDEN_DIR, "golden.npz"), out_npz,
                   cwd=str(tmp_path))
    ref_out = np.load(out_npz)

    _, probs = net.forward(g["X"], g["y"], test_mode=True)
    np.testing.assert_allclose(ref_out["test_probs"], np.asarray(probs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ref_out["test_probs"], g["test_probs"],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not available")
def test_goldens_regenerate_identically(tmp_path):
    """The committed goldens are reproducible from the live reference."""
    _run_reference("produce", str(tmp_path / "fresh"), cwd=str(tmp_path))
    fresh = np.load(str(tmp_path / "fresh" / "golden.npz"))
    committed = np.load(os.path.join(GOLDEN_DIR, "golden.npz"))
    for key in committed.files:
        np.testing.assert_array_equal(fresh[key], committed[key])
