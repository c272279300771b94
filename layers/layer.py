"""Reference-import compatibility shim: the reference's examples import top-level packages (e.g. ``from layers.layer import Layer``, see reference examples/*.py) — re-exported from dorknet_tpu so those scripts run unchanged."""
from dorknet_tpu.layers.base import Layer
