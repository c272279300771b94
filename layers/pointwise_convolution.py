"""Reference-import compatibility shim: the reference's examples import top-level packages (e.g. ``from layers.pointwise_convolution import PointwiseConvLayer``, see reference examples/*.py) — re-exported from dorknet_tpu so those scripts run unchanged."""
from dorknet_tpu.layers.pointwise_convolution import PointwiseConvLayer
