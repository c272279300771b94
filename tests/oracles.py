"""Pure-NumPy oracles transliterating the reference's *naive* retained
implementations (its own cross-check oracles, SURVEY §4) — used to verify the
XLA/Pallas fast paths. All loops, no vectorisation tricks: correctness only."""

import numpy as np


def conv2d_oracle(x, w, b=None, stride=1, padding=0):
    """x: (N,C,H,W); w: (O,I,fh,fw). Matches reference ConvLayer forward
    (im2col+GEMM, layers/convolution.py:58-87)."""
    N, C, H, W = x.shape
    O, I, fh, fw = w.shape
    if padding > 0:
        x = np.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)))
    P = (x.shape[2] - fh) // stride + 1
    Q = (x.shape[3] - fw) // stride + 1
    out = np.zeros((N, O, P, Q), dtype=np.float64)
    for n in range(N):
        for o in range(O):
            for i in range(P):
                for j in range(Q):
                    patch = x[n, :, i * stride:i * stride + fh, j * stride:j * stride + fw]
                    out[n, o, i, j] = np.sum(patch * w[o])
    if b is not None:
        out += b.reshape(1, -1, 1, 1)
    return out.astype(np.float32)


def depthwise_conv2d_oracle(x, w, b=None, stride=1, padding=1):
    """x: (N,C,H,W); w: (C,fh,fw). Matches reference depthwise_conv_cy
    (layers/im2col.pyx:109-139)."""
    N, C, H, W = x.shape
    _, fh, fw = w.shape
    if padding > 0:
        x = np.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)))
    P = (x.shape[2] - fh) // stride + 1
    Q = (x.shape[3] - fw) // stride + 1
    out = np.zeros((N, C, P, Q), dtype=np.float64)
    for n in range(N):
        for c in range(C):
            for i in range(P):
                for j in range(Q):
                    patch = x[n, c, i * stride:i * stride + fh, j * stride:j * stride + fw]
                    out[n, c, i, j] = np.sum(patch * w[c])
    if b is not None:
        out += b.reshape(1, -1, 1, 1)
    return out.astype(np.float32)


def pointwise_conv2d_oracle(x, w, b=None, stride=1):
    """x: (N,C,H,W); w: (O,C). Subsample-then-GEMM semantics
    (reference: layers/pointwise_convolution.py:46-55)."""
    if stride > 1:
        x = x[:, :, ::stride, ::stride]
    N, C, H, W = x.shape
    patches = x.transpose(0, 2, 3, 1).reshape(-1, C)
    out = patches @ w.T
    if b is not None:
        out += b.reshape(1, -1)
    return out.reshape(N, H, W, w.shape[0]).transpose(0, 3, 1, 2).astype(np.float32)


def max_pool_oracle(x, stride):
    """Square non-overlapping window == stride (reference: layers/pooling_cy.pyx:10-33)."""
    N, C, H, W = x.shape
    P, Q = H // stride, W // stride
    out = np.zeros((N, C, P, Q), dtype=x.dtype)
    for i in range(P):
        for j in range(Q):
            out[:, :, i, j] = x[:, :, i * stride:(i + 1) * stride,
                                j * stride:(j + 1) * stride].max(axis=(2, 3))
    return out


def batch_norm_train_oracle(x, gamma, beta, running_mean, running_std,
                            momentum=0.95, eps=1e-5):
    """Reference train-mode BN (layers/batch_norm.py:54-100): batch stats,
    running-**std** EMA (first batch adopts the batch stats), scale/shift.
    x 2-D (N,C) or 4-D (N,C,H,W) with gamma broadcast-shaped."""
    axis = (0, 2, 3) if x.ndim == 4 else 0
    mean = np.mean(x, axis=axis)
    var = np.var(x, axis=axis)
    std = np.sqrt(var + eps)
    if x.ndim == 4:
        mean = mean.reshape(1, -1, 1, 1)
        std = std.reshape(1, -1, 1, 1)
    x_hat = (x - mean) / std
    y = gamma * x_hat + beta
    if running_mean is None:
        new_mean, new_std = mean, std
    else:
        new_mean = momentum * running_mean + (1 - momentum) * mean
        new_std = momentum * running_std + (1 - momentum) * std
    return y.astype(np.float32), new_mean, new_std


def batch_norm_dx_oracle(x, gamma, upstream_dx, eps=1e-5):
    """Reference manual BN input-gradient (layers/batch_norm.py:124-156)."""
    axis = (0, 2, 3) if x.ndim == 4 else 0
    mean = np.mean(x, axis=axis)
    var = np.var(x, axis=axis)
    if x.ndim == 4:
        mean = mean.reshape(1, -1, 1, 1)
    std = np.sqrt(var + eps)
    if x.ndim == 4:
        std = std.reshape(1, -1, 1, 1)
    x_demean = x - mean
    upstream_mean = np.mean(upstream_dx, axis=axis)
    if x.ndim == 4:
        upstream_mean = upstream_mean.reshape(1, -1, 1, 1)
    eff_b = float(x.shape[0] * x.shape[2] * x.shape[3]) if x.ndim == 4 else float(x.shape[0])
    factor = gamma / std
    other = (1.0 / eff_b) * (x_demean / (std ** 2))
    dot_sum = np.sum(upstream_dx * x_demean, axis=axis)
    if x.ndim == 4:
        dot_sum = dot_sum.reshape(1, -1, 1, 1)
    return (factor * (upstream_dx - upstream_mean - other * dot_sum)).astype(np.float32)


def softmax_oracle(logits):
    e = np.exp(logits)  # raw exp, as the reference (layers/losses.py:15-16)
    return e / e.sum(axis=1, keepdims=True)


def softmax_xent_oracle(logits, y_soft):
    p = softmax_oracle(logits)
    loss = np.mean(-np.log(np.sum(p * y_soft, axis=1)))
    dlogits = (p - y_soft) / logits.shape[0]
    return loss, p, dlogits
