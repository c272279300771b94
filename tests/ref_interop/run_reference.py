"""Drive the ORIGINAL Dorknet reference (/root/reference) on pure NumPy to
prove checkpoint interchange with dorknet_tpu.

The reference's four compiled Cython kernel modules are replaced by the
NumPy implementations in ``stub_modules/`` (plus cupy/numexpr facades), so
its CPU path runs unmodified in an environment without Cython/CUDA. Run as
a SUBPROCESS with a clean sys.path — the reference uses the same top-level
package names (``layers``, ``network``, ...) as this repo's compat shims.

Usage:
  python run_reference.py produce <outdir>
      Build a small net covering every checkpoint-dispatch layer type
      (ref network/feed_forward_network.py:106-139), run one train-mode
      forward+backward (populates BN running stats and grads — the writer
      saves grads unconditionally, ref convolution.py:249-258), save
      h5+json with the REFERENCE writers, and record inputs/outputs in
      golden.npz.

  python run_reference.py consume <json> <h5> <input_npz> <out_npz>
      Load a dorknet_tpu-written checkpoint with the REFERENCE loader, run
      a test-mode forward on the given input, write the scores.
"""
import json
import os
import sys

import numpy as np

# numpy 2.x removed np.string_; the reference writer uses it for the
# regulariser h5 attrs (ref convolution.py:241-242).
if not hasattr(np, "string_"):
    np.string_ = np.bytes_

# numpy 2.x also removed the numpy.lib.function_base submodule, which the
# reference imports `select` from (ref depthwise_convolution.py:6).
if "numpy.lib.function_base" not in sys.modules:
    import types

    _fb = types.ModuleType("numpy.lib.function_base")
    _fb.select = np.select
    sys.modules["numpy.lib.function_base"] = _fb

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF = os.environ.get("DORKNET_REFERENCE", "/root/reference")
sys.dont_write_bytecode = True  # the reference tree is read-only
sys.path.insert(0, _REF)
sys.path.insert(0, os.path.join(_HERE, "stub_modules"))

from layers.activations import ReLu                        # noqa: E402
from layers.batch_norm import BatchNormLayer               # noqa: E402
from layers.convolution import ConvLayer                   # noqa: E402
from layers.dense_layer import DenseLayer                  # noqa: E402
from layers.depthwise_convolution import DepthwiseConvLayer  # noqa: E402
from layers.losses import SoftmaxWithCrossEntropy          # noqa: E402
from layers.pointwise_convolution import PointwiseConvLayer  # noqa: E402
from layers.pooling import GlobalAveragePoolingLayer       # noqa: E402
from layers.residual_block import ResidualBlock            # noqa: E402
from network.feed_forward_network import FeedForwardNetwork  # noqa: E402
from regularisers.l2 import l2                             # noqa: E402

NUM_CLASSES = 5


def build_net():
    """Small net exercising every layer type in the checkpoint dispatch:
    Conv (+l2), BN, ReLu, ResidualBlock (depthwise/BN/ReLu/pointwise inner
    list + strided pointwise skip projection), GAP, Dense, Softmax-CE."""
    np.random.seed(1234)
    net = FeedForwardNetwork("ref_interop_golden")
    net.add_layer(ConvLayer("conv1", filter_block_shape=(8, 3, 3, 3),
                            stride=1, padding=1,
                            weight_regulariser=l2(1e-4)))
    net.add_layer(BatchNormLayer("bn1", incoming_chans=8))
    net.add_layer(ReLu("relu1"))
    net.add_layer(ResidualBlock(
        "res1",
        layer_list=[
            DepthwiseConvLayer("res1_dw", filter_block_shape=(8, 3, 3),
                               stride=1, padding=1),
            BatchNormLayer("res1_bn1", incoming_chans=8),
            ReLu("res1_relu"),
            PointwiseConvLayer("res1_pw", filter_block_shape=(16, 8), stride=2),
            BatchNormLayer("res1_bn2", incoming_chans=16),
        ],
        skip_projection=PointwiseConvLayer("res1_skip",
                                           filter_block_shape=(16, 8),
                                           stride=2),
        post_skip_activation=ReLu("res1_act")))
    net.add_layer(GlobalAveragePoolingLayer("gap"))
    net.add_layer(DenseLayer("dense1", incoming_chans=16,
                             output_dim=NUM_CLASSES))
    net.set_loss_layer(SoftmaxWithCrossEntropy("loss"))
    return net


def make_batch():
    rng = np.random.RandomState(99)
    X = rng.randn(4, 3, 12, 12).astype(np.float32)
    y = np.eye(NUM_CLASSES, dtype=np.float32)[rng.randint(0, NUM_CLASSES, 4)]
    return X, y


def produce(outdir):
    os.makedirs(outdir, exist_ok=True)
    net = build_net()
    X, y = make_batch()

    train_loss, train_probs = net.forward(X, y)   # adopts BN running stats
    net.backward()                                # populates grads
    net.save_weights_to_h5(os.path.join(outdir, "ref_weights.h5"))
    net.save_layer_structure_to_json(os.path.join(outdir, "ref_structure.json"))

    test_loss, test_probs = net.forward(X, y, test_mode=True)
    _, tap = net.forward(X, y, test_mode=True, terminal_layer_name="relu1")
    np.savez(os.path.join(outdir, "golden.npz"),
             X=X, y=y,
             train_loss=np.float32(train_loss), train_probs=train_probs,
             test_loss=np.float32(test_loss), test_probs=test_probs,
             tap_relu1=tap)
    print("produced goldens in", outdir)


def consume(json_path, h5_path, input_npz, out_npz):
    net = FeedForwardNetwork("consumer")
    net.load_network_from_json_and_h5(json_path, h5_path)
    data = np.load(input_npz)
    X, y = data["X"], data["y"]
    test_loss, test_probs = net.forward(X, y, test_mode=True)
    np.savez(out_npz, test_loss=np.float32(test_loss), test_probs=test_probs)
    print("consumed", h5_path, "->", out_npz)


if __name__ == "__main__":
    if sys.argv[1] == "produce":
        produce(sys.argv[2])
    elif sys.argv[1] == "consume":
        consume(*sys.argv[2:6])
    else:
        raise SystemExit("usage: run_reference.py produce <outdir> | "
                         "consume <json> <h5> <input_npz> <out_npz>")
