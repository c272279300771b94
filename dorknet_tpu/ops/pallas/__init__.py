"""Pallas TPU kernels — opt-in fast paths for the hot ops.

Each kernel is the TPU-native analogue of one of the reference's native kernel
backends (SURVEY §2.1): the Cython+OpenMP .pyx kernels and embedded CUDA
RawKernels become Mosaic kernels over VMEM/MXU/VPU. Every kernel is gated by
``dorknet_tpu.config.use_pallas()`` with the XLA-native op as both fallback and
correctness oracle (tests run the kernels in interpreter mode on CPU and
compiled on TPU)."""

from dorknet_tpu.ops.pallas.bn_stats import batch_norm_stats
from dorknet_tpu.ops.pallas.depthwise import depthwise3x3
from dorknet_tpu.ops.pallas.matmul import matmul, matmul_bn_stats

__all__ = ["batch_norm_stats", "depthwise3x3", "matmul",
           "matmul_bn_stats"]
