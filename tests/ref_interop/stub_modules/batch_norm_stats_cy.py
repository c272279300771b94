"""NumPy stand-in for the reference's compiled BN stats kernel
(``/root/reference/layers/batch_norm_stats_cy.pyx``): per-channel mean and
population variance over (B, H, W) of a (B, C, H, W) array."""
import numpy as np


def channelwise_mean_and_var_4d(A):
    A = np.asarray(A, dtype=np.float32)
    mean = A.mean(axis=(0, 2, 3), dtype=np.float64)
    var = A.var(axis=(0, 2, 3), dtype=np.float64)
    return mean.astype(np.float32), var.astype(np.float32)
