"""Reference-import compatibility shim: the reference's examples import top-level packages (e.g. ``from layers.dense_layer import DenseLayer``, see reference examples/*.py) — re-exported from dorknet_tpu so those scripts run unchanged."""
from dorknet_tpu.layers.dense_layer import DenseLayer
