"""Reference-import compatibility shim: the reference's examples import top-level packages (e.g. ``from optimisers.RMSProp import RMSProp``, see reference examples/*.py) — re-exported from dorknet_tpu so those scripts run unchanged."""
from dorknet_tpu.optimisers.RMSProp import RMSProp
