"""Reference-import compatibility shim: the reference's examples import top-level packages (e.g. ``from layers.reshape import ReshapeLayer``, see reference examples/*.py) — re-exported from dorknet_tpu so those scripts run unchanged."""
from dorknet_tpu.layers.reshape import ReshapeLayer
