"""Vectorised NumPy implementations of the reference's compiled
``im2col`` Cython module (``/root/reference/layers/im2col.pyx``), so the
reference CPU path runs in an environment without Cython.

Return contracts (shapes, float patch counts, padding handling) follow the
.pyx signatures exactly; the bodies are fresh NumPy (stride-trick windows +
einsum), not transliterations of the loop nests.
"""
import numpy as np
from numpy.lib.stride_tricks import sliding_window_view


def _windows(X, f_rows, f_cols, stride):
    """(B,C,H,W) -> (B,C,P,Q,fr,fc) strided view of conv windows."""
    win = sliding_window_view(X, (f_rows, f_cols), axis=(2, 3))
    return win[:, :, ::stride, ::stride]


def im2col_cy(X, f_rows, f_cols, stride):
    """Patch matrix (B*P*Q, C*fr*fc) with (C, fr, fc) inner layout
    (matches the weight reshape in convolution.py:64). Returns the patch
    counts un-truncated as floats, per the .pyx contract (im2col.pyx:18-21)."""
    X = np.asarray(X, dtype=np.float32)
    full_p = (X.shape[2] - f_rows) / stride + 1
    full_q = (X.shape[3] - f_cols) / stride + 1
    win = _windows(X, f_rows, f_cols, stride)
    B, C, P, Q = win.shape[:4]
    patches = win.transpose(0, 2, 3, 1, 4, 5).reshape(B * P * Q, C * f_rows * f_cols)
    return np.ascontiguousarray(patches, dtype=np.float32), full_p, full_q


def row2im_cy(X, batch_size, full_num_row_patches, full_num_col_patches,
              f_rows, f_cols, num_channels, stride, padding):
    """Scatter-add inverse of im2col_cy: rows back onto the padded image,
    then slice the padding off (im2col.pyx:209-234)."""
    P = int(full_num_row_patches)
    Q = int(full_num_col_patches)
    hp = stride * (P - 1) + f_rows
    wp = stride * (Q - 1) + f_cols
    rows = np.asarray(X, dtype=np.float32).reshape(
        batch_size, P, Q, num_channels, f_rows, f_cols)
    out = np.zeros((batch_size, num_channels, hp, wp), dtype=np.float32)
    for m in range(f_rows):
        for n in range(f_cols):
            # Within one (m, n) tap the target positions are `stride` apart
            # and never collide, so a strided += is an exact scatter-add.
            out[:, :, m:m + stride * P:stride, n:n + stride * Q:stride] += (
                rows[:, :, :, :, m, n].transpose(0, 3, 1, 2))
    if padding > 0:
        out = out[:, :, padding:-padding, padding:-padding].copy()
    return out


def depthwise_conv_cy(X, f, f_rows, f_cols, stride):
    """Direct depthwise conv: X (B,C,H,W), f (C,fr,fc) -> (B,C,P,Q)
    (im2col.pyx:109-139)."""
    X = np.asarray(X, dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    full_p = (X.shape[2] - f_rows) / stride + 1
    full_q = (X.shape[3] - f_cols) / stride + 1
    win = _windows(X, f_rows, f_cols, stride)
    out = np.einsum("bcpqmn,cmn->bcpq", win, f).astype(np.float32)
    return out, full_p, full_q


def depthwise_backward_direct_cy(upstream_dx, X, w, full_num_row_patches,
                                 full_num_col_patches, stride, padding):
    """Fused depthwise backward: per-batch dw (B,C,fr,fc) AND input grad dx
    in one pass (im2col.pyx:143-178). X is the PADDED forward input."""
    upstream_dx = np.asarray(upstream_dx, dtype=np.float32)
    X = np.asarray(X, dtype=np.float32)
    w = np.asarray(w, dtype=np.float32)
    f_rows, f_cols = w.shape[1], w.shape[2]
    P = int(full_num_row_patches)
    Q = int(full_num_col_patches)
    hp = stride * (P - 1) + f_rows
    wp = stride * (Q - 1) + f_cols
    B, C = X.shape[0], X.shape[1]

    win = _windows(X, f_rows, f_cols, stride)  # (B,C,P,Q,fr,fc)
    dw = np.einsum("bcpq,bcpqmn->bcmn", upstream_dx, win).astype(np.float32)

    padded_dx = np.zeros((B, C, hp, wp), dtype=np.float32)
    for m in range(f_rows):
        for n in range(f_cols):
            padded_dx[:, :, m:m + stride * P:stride, n:n + stride * Q:stride] += (
                upstream_dx * w[np.newaxis, :, m, n, np.newaxis, np.newaxis])
    if padding > 0:
        dx = padded_dx[:, :, padding:-padding, padding:-padding].copy()
    else:
        dx = padded_dx
    return dx, dw
