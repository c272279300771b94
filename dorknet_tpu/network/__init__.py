from dorknet_tpu.network.feed_forward_network import FeedForwardNetwork
from dorknet_tpu.network.trainer import Trainer
from dorknet_tpu.network.inference import (InferenceRunner, ServingArtifact,
                                            load_serving_artifact,
                                            load_serving_program)
from dorknet_tpu.network.quantized import QuantizedInferenceRunner
from dorknet_tpu.network.serving import BatchingServer

__all__ = ["FeedForwardNetwork", "Trainer", "InferenceRunner",
           "QuantizedInferenceRunner", "BatchingServer",
           "load_serving_program", "ServingArtifact",
           "load_serving_artifact"]
