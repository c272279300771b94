from dorknet_tpu.optimisers.SGD import SGD
from dorknet_tpu.optimisers.SGDMomentum import SGDMomentum
from dorknet_tpu.optimisers.RMSProp import RMSProp
from dorknet_tpu.optimisers.optax_adapter import OptaxOptimiser

__all__ = ["SGD", "SGDMomentum", "RMSProp", "OptaxOptimiser"]
