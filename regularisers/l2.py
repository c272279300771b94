"""Reference-import compatibility shim: the reference's examples import top-level packages (e.g. ``from regularisers.l2 import l2``, see reference examples/*.py) — re-exported from dorknet_tpu so those scripts run unchanged."""
from dorknet_tpu.regularisers.l2 import l2
