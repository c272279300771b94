from dorknet_tpu.network.feed_forward_network import FeedForwardNetwork
from dorknet_tpu.network.trainer import Trainer

__all__ = ["FeedForwardNetwork", "Trainer"]
