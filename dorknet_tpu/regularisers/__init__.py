from dorknet_tpu.regularisers.l2 import l2

__all__ = ["l2"]
