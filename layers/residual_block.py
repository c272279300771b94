"""Reference-import compatibility shim: the reference's examples import top-level packages (e.g. ``from layers.residual_block import ResidualBlock``, see reference examples/*.py) — re-exported from dorknet_tpu so those scripts run unchanged."""
from dorknet_tpu.layers.residual_block import ResidualBlock
