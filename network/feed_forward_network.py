"""Reference-import compatibility shim: the reference's examples import top-level packages (e.g. ``from network.feed_forward_network import FeedForwardNetwork``, see reference examples/*.py) — re-exported from dorknet_tpu so those scripts run unchanged."""
from dorknet_tpu.network.feed_forward_network import FeedForwardNetwork
