"""On-device augmentation — the TPU-first replacement for the cv2 host path.

The reference augments per-image on host CPU threads (cv2 HSV scaling,
warpAffine rotation, flip — data_loading/image_augmentation.py) and mixes up on
host numpy (image_data_loader.py:100-112). Here the whole augmentation stack is
a single vmapped, jitted program over the batch: random crop, horizontal flip,
HSV perturbation, rotation (bilinear gather), mixup pairing — keyed by
``jax.random`` so it is reproducible and runs at HBM bandwidth instead of host
memory bandwidth. The host keeps only decode (JPEG) + resize-to-precrop.

Images here are float32 BGR in [0,255], NHWC (pre -128 shift); the pipeline
shifts at the end like the reference preprocessor.
"""

from functools import partial

import math

import jax
import jax.numpy as jnp


def random_crop(key, im, out_hw):
    """im (H,W,C) -> (out_h,out_w,C), uniform offset like the reference's
    random crop (image_preprocessor.py:18-24)."""
    H, W, C = im.shape
    oh, ow = out_hw
    kr, kc = jax.random.split(key)
    # max(...,1): degenerate precrop==crop yields offset 0 instead of an
    # invalid randint range (the reference would crash the same way,
    # image_preprocessor.py:21-22 randint(0, 0))
    r = jax.random.randint(kr, (), 0, max(H - oh, 1))
    c = jax.random.randint(kc, (), 0, max(W - ow, 1))
    return jax.lax.dynamic_slice(im, (r, c, 0), (oh, ow, C))


def center_crop(im, out_hw):
    H, W, C = im.shape
    oh, ow = out_hw
    return jax.lax.dynamic_slice(im, ((H - oh) // 2, (W - ow) // 2, 0), (oh, ow, C))


def horizontal_flip(key, im, prob):
    do = jax.random.uniform(key) < prob
    return jnp.where(do, im[:, ::-1, :], im)


def _bgr_to_hsv(im):
    """OpenCV-convention HSV for float BGR in [0,255]: H in [0,180), S,V in
    [0,255] (matches cv2.COLOR_BGR2HSV semantics the reference relies on)."""
    if jnp.issubdtype(im.dtype, jnp.integer):
        # channel differences below go negative: unsigned ints would wrap
        im = im.astype(jnp.float32)
    b, g, r = im[..., 0], im[..., 1], im[..., 2]
    v = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    h = jnp.where(v == r, 60.0 * (g - b) / safe,
                  jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                            240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # cv2 packs H into [0,180)
    s = jnp.where(v == 0, 0.0, 255.0 * diff / jnp.where(v == 0, 1.0, v))
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_bgr(hsv):
    h, s, v = hsv[..., 0] * 2.0, hsv[..., 1] / 255.0, hsv[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    z = jnp.zeros_like(c)
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [c, x, z, z, x, c])
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [x, c, c, x, z, z])
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [z, z, x, c, c, x])
    m = v - c
    return jnp.stack([b + m, g + m, r + m], axis=-1)


def hsv_perturb(key, im, hsv_pert_tuples):
    """Scale H/S/V by uniform factors then clip (reference
    image_augmentation.py:41-50, including the H<=179 clip)."""
    ks = jax.random.split(key, 3)
    scales = [jax.random.uniform(ks[i], (), minval=lo, maxval=hi)
              for i, (lo, hi) in enumerate(hsv_pert_tuples)]
    hsv = _bgr_to_hsv(im)
    hsv = hsv * jnp.stack(scales)
    hsv = jnp.clip(hsv, 0.0, 255.0)
    hsv = hsv.at[..., 0].set(jnp.clip(hsv[..., 0], 0.0, 179.0))
    return jnp.clip(_hsv_to_bgr(hsv), 0.0, 255.0)


def rotate(key, im, rotation_tuple):
    """Rotate about the centre by a uniform angle, bilinear resample with zero
    fill (reference image_augmentation.py:61-66 / cv2.warpAffine)."""
    deg = jax.random.uniform(key, (), minval=rotation_tuple[0],
                             maxval=rotation_tuple[1])
    # cv2.getRotationMatrix2D maps src→dst with A=[[cos,sin],[-sin,cos]] about
    # (W/2, H/2); warpAffine inverse-maps, so dst(x,y) samples src at A⁻¹·(x,y).
    theta = deg * jnp.pi / 180.0
    H, W, C = im.shape
    cy, cx = H / 2.0, W / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) - cx
    src_x = jnp.cos(theta) * xx - jnp.sin(theta) * yy + cx
    src_y = jnp.sin(theta) * xx + jnp.cos(theta) * yy + cy

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = im[yi, xi]  # (H,W,C) gather
        return jnp.where(inb[..., None], vals, 0.0)

    out = ((1 - wy)[..., None] * ((1 - wx)[..., None] * gather(y0, x0)
                                  + wx[..., None] * gather(y0, x0 + 1))
           + wy[..., None] * ((1 - wx)[..., None] * gather(y0 + 1, x0)
                              + wx[..., None] * gather(y0 + 1, x0 + 1)))
    return out


def _resample_rows(im_pad, shifts, P, W_out):
    """out[i, x] = lerp(im_pad[i, x + P + shifts[i]]) for x in [0, W_out) —
    per-row 1-D bilinear resample via contiguous dynamic slices (TPU-cheap,
    unlike 2-D gathers)."""
    s0 = jnp.floor(shifts).astype(jnp.int32)
    frac = (shifts - s0)[:, None, None]

    def row(r, start):
        sl = jax.lax.dynamic_slice(r, (start + P, 0), (W_out + 1, r.shape[1]))
        return sl

    sl = jax.vmap(row)(im_pad, s0)  # (H, W_out+1, C)
    return (1.0 - frac) * sl[:, :W_out] + frac * sl[:, 1:]


def rotate_shear(key, im, rotation_tuple):
    """Rotation by the classic three-shear decomposition
    R(θ) = ShearX(-tan θ/2) · ShearY(sin θ) · ShearX(-tan θ/2): each shear is a
    per-row (or per-column) 1-D resample implemented with contiguous dynamic
    slices — ~10x faster on TPU than the per-pixel bilinear gather of
    ``rotate`` (kept as the exact cv2-matched oracle). Zero fill like
    cv2.warpAffine; interiors match the gather rotation within interpolation
    blur (three lerps vs one)."""
    deg = jax.random.uniform(key, (), minval=rotation_tuple[0],
                             maxval=rotation_tuple[1])
    theta = deg * jnp.pi / 180.0
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    H, W, C = im.shape
    cy, cx = H / 2.0, W / 2.0
    # static padding bound from the angle range
    max_t = max(abs(rotation_tuple[0]), abs(rotation_tuple[1])) * math.pi / 180.0
    P = int(math.ceil(max(math.tan(max_t / 2.0), math.sin(max_t)) * max(H, W) / 2.0)) + 2

    rows = jax.lax.broadcasted_iota(jnp.float32, (H,), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (W,), 0)

    def shear_x(img, coef):
        # inverse map: in_x = out_x + coef*(row - cy)
        pad = jnp.pad(img, ((0, 0), (P, P), (0, 0)))
        return _resample_rows(pad, coef * (rows - cy), P, W)

    def shear_y(img, coef):
        pad = jnp.pad(img, ((P, P), (0, 0), (0, 0)))
        out = _resample_rows(jnp.transpose(pad, (1, 0, 2)),
                             coef * (cols - cx), P, H)
        return jnp.transpose(out, (1, 0, 2))

    out = shear_x(im, a)
    out = shear_y(out, b)
    out = shear_x(out, a)
    return out


# --------------------------------------------------------------------- #
# CHW fast path. With channels-last and C=3, every op wastes ~97% of the
# TPU's 128-wide lane dimension; laying images out as (C, H, W) puts W in the
# lanes (225/256 utilisation) — measured several-fold faster. The HWC
# functions above remain as the cv2-parity oracles.
# --------------------------------------------------------------------- #

def _bgr_to_hsv_chw(im):
    if jnp.issubdtype(im.dtype, jnp.integer):
        im = im.astype(jnp.float32)  # unsigned wrap guard, see _bgr_to_hsv
    b, g, r = im[0], im[1], im[2]
    v = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    diff = v - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    h = jnp.where(v == r, 60.0 * (g - b) / safe,
                  jnp.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                            240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0
    sat = jnp.where(v == 0, 0.0, 255.0 * diff / jnp.where(v == 0, 1.0, v))
    return h, sat, v


def _hsv_to_bgr_chw(h, s, v):
    h2, s2 = h * 2.0, s / 255.0
    c = v * s2
    hp = h2 / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    z = jnp.zeros_like(c)
    # hp lives in [0, 6) (h <= 179.5 so h2 < 360): floor is already 0..5 and
    # the "% 6" was a no-op — clip keeps the guarantee without an integer
    # rem, which Mosaic (the pallas aug kernel reuses this helper) can't lower
    idx = jnp.clip(jnp.floor(hp).astype(jnp.int32), 0, 5)

    # nested wheres instead of jnp.select: the sectors are mutually
    # exclusive so they're equivalent, and jnp.select lowers through an
    # integer argmax Mosaic can't compile (pallas aug kernel reuses this)
    def sel(vals):
        out = vals[5]
        for i in range(4, -1, -1):
            out = jnp.where(idx == i, vals[i], out)
        return out
    r = sel([c, x, z, z, x, c])
    g = sel([x, c, c, x, z, z])
    b = sel([z, z, x, c, c, x])
    m = v - c
    return jnp.stack([b + m, g + m, r + m], axis=0)


def hsv_perturb_chw(key, im, hsv_pert_tuples):
    ks = jax.random.split(key, 3)
    scales = [jax.random.uniform(ks[i], (), minval=lo, maxval=hi)
              for i, (lo, hi) in enumerate(hsv_pert_tuples)]
    h, s, v = _bgr_to_hsv_chw(im)
    h = jnp.clip(h * scales[0], 0.0, 179.0)
    s = jnp.clip(s * scales[1], 0.0, 255.0)
    v = jnp.clip(v * scales[2], 0.0, 255.0)
    return jnp.clip(_hsv_to_bgr_chw(h, s, v), 0.0, 255.0)


def random_crop_chw(key, im, out_hw):
    C, H, W = im.shape
    oh, ow = out_hw
    kr, kc = jax.random.split(key)
    r = jax.random.randint(kr, (), 0, max(H - oh, 1))
    c = jax.random.randint(kc, (), 0, max(W - ow, 1))
    return jax.lax.dynamic_slice(im, (0, r, c), (C, oh, ow))


def center_crop_chw(im, out_hw):
    C, H, W = im.shape
    oh, ow = out_hw
    return jax.lax.dynamic_slice(im, (0, (H - oh) // 2, (W - ow) // 2),
                                 (C, oh, ow))


def _resample_rows2d(im_pad, shifts, P, W_out):
    """im_pad (N, Wp); out[i, x] = lerp(im_pad[i, x + P + shifts[i]])."""
    s0 = jnp.floor(shifts).astype(jnp.int32)
    frac = (shifts - s0)[:, None]

    def row(r, start):
        return jax.lax.dynamic_slice(r, (start + P,), (W_out + 1,))

    sl = jax.vmap(row)(im_pad, s0)
    return (1.0 - frac) * sl[:, :W_out] + frac * sl[:, 1:]


def rotate_shear_chw(key, im, rotation_tuple):
    """Three-shear rotation on (C, H, W) — per-(channel,row) contiguous slices."""
    deg = jax.random.uniform(key, (), minval=rotation_tuple[0],
                             maxval=rotation_tuple[1])
    theta = deg * jnp.pi / 180.0
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    C, H, W = im.shape
    cy, cx = H / 2.0, W / 2.0
    max_t = max(abs(rotation_tuple[0]), abs(rotation_tuple[1])) * math.pi / 180.0
    P = int(math.ceil(max(math.tan(max_t / 2.0), math.sin(max_t)) * max(H, W) / 2.0)) + 2

    rows = jax.lax.broadcasted_iota(jnp.float32, (H,), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (W,), 0)

    def shear_x(img, coef):  # resample along W, shift linear in row index
        pad = jnp.pad(img, ((0, 0), (0, 0), (P, P)))
        flat = pad.reshape(C * H, W + 2 * P)
        shifts = jnp.tile(coef * (rows - cy), C)
        return _resample_rows2d(flat, shifts, P, W).reshape(C, H, W)

    def shear_y(img, coef):  # resample along H, shift linear in column index
        t = jnp.transpose(img, (0, 2, 1))  # (C, W, H)
        pad = jnp.pad(t, ((0, 0), (0, 0), (P, P)))
        flat = pad.reshape(C * W, H + 2 * P)
        shifts = jnp.tile(coef * (cols - cx), C)
        out = _resample_rows2d(flat, shifts, P, H).reshape(C, W, H)
        return jnp.transpose(out, (0, 2, 1))

    out = shear_x(im, a)
    out = shear_y(out, b)
    out = shear_x(out, a)
    return out


def augment_image_chw(key, im, out_hw, hsv_pert_tuples=None, rotation_tuple=None,
                      horizontal_flip_prob=None, crop_mode="random"):
    """Per-image augmentation chain over (C, H, W), reference order."""
    k_crop, k_hsv, k_rot, k_flip = jax.random.split(key, 4)
    if crop_mode == "random":
        im = random_crop_chw(k_crop, im, out_hw)
    elif crop_mode == "center":
        im = center_crop_chw(im, out_hw)
    if hsv_pert_tuples is not None:
        im = hsv_perturb_chw(k_hsv, im, hsv_pert_tuples)
    if rotation_tuple is not None:
        im = rotate_shear_chw(k_rot, im, rotation_tuple)
    if horizontal_flip_prob is not None:
        do = jax.random.uniform(k_flip) < horizontal_flip_prob
        im = jnp.where(do, im[:, :, ::-1], im)
    return im


def augment_image(key, im, out_hw, hsv_pert_tuples=None, rotation_tuple=None,
                  horizontal_flip_prob=None, crop_mode="random",
                  fast_rotation=True):
    """Full per-image augmentation chain in the reference's order
    (crop happens in the preprocessor before augment: resize→crop→HSV→rot→flip).
    HWC oracle path; the batched pipeline uses the CHW fast path.
    fast_rotation uses the three-shear rotation (rotate_shear); False selects
    the exact cv2-matched gather rotation."""
    k_crop, k_hsv, k_rot, k_flip = jax.random.split(key, 4)
    if crop_mode == "random":
        im = random_crop(k_crop, im, out_hw)
    elif crop_mode == "center":
        im = center_crop(im, out_hw)
    if hsv_pert_tuples is not None:
        im = hsv_perturb(k_hsv, im, hsv_pert_tuples)
    if rotation_tuple is not None:
        rot = rotate_shear if fast_rotation else rotate
        im = rot(k_rot, im, rotation_tuple)
    if horizontal_flip_prob is not None:
        im = horizontal_flip(k_flip, im, horizontal_flip_prob)
    return im


# --------------------------------------------------------------------- #
# Batched "planes" path (round 2) — the production pipeline.
#
# The vmapped per-image paths above are kept as oracles, but they are slow on
# TPU: per-image dynamic slices lower to gathers, and HWC keeps C=3 in the
# 128-wide lane dimension. This path processes the WHOLE batch as (B, 3, H, W)
# planes (W in lanes, ~88% utilisation at 225px) and implements every
# data-dependent spatial move as a BARREL SHIFT — ceil(log2(range)) rounds of
# {static roll, elementwise select} — so the entire augmentation stack is
# static slices + elementwise ops: no gathers, no per-image program, fully
# fused by XLA at HBM bandwidth.
# --------------------------------------------------------------------- #

def _barrel_shift(x, t, axis, nbits):
    """Variable LEFT shift along ``axis``: out[..., i, ...] = x[..., i+t, ...].

    ``t`` int32 >= 0, broadcastable to x with size 1 on ``axis``. Zero fill
    is the caller's responsibility: reads must land in zero margins (rolled
    wrap-around elements are harmless iff the wrapped region is zero, which
    the padding schemes below guarantee)."""
    for j in range(nbits):
        rolled = jnp.roll(x, -(1 << j), axis=axis)
        x = jnp.where(((t >> j) & 1).astype(bool), rolled, x)
    return x


def _shift_resample(x, t_float, axis, nbits):
    """1-D bilinear resample: out = lerp(x at index i + t_float) via a barrel
    shift by floor(t) and one +1-neighbour lerp.

    Dtype-preserving: integer inputs run the shift rounds at 1 byte/pixel
    (the whole point — 4x less HBM traffic than fp32), lerp in float32, and
    round back, mirroring cv2's fixed-point warp rounding. The lerp dtype is
    fp32 ON PURPOSE, not bf16: the lerp temporaries are fusion-internal (the
    materialised intermediates are uint8 either way, so there is no traffic
    to save), and on TPU XLA compiled the former explicit-bf16 casts with
    excess precision anyway (fp32 inside the fusion, one rounding at the
    store) while interpret/CPU executed literal bf16 — a backend-dependent
    output that broke kernel-vs-planes bit-equality on chip (PERF.md
    round-3 session-4/5). fp32 makes the numerics backend-independent and
    strictly closer to cv2."""
    t0 = jnp.floor(t_float)
    frac = t_float - t0
    x0 = _barrel_shift(x, t0.astype(jnp.int32), axis, nbits)
    x1 = jnp.roll(x0, -1, axis=axis)
    if jnp.issubdtype(x.dtype, jnp.integer):
        frac = frac.astype(jnp.float32)
        out = ((1.0 - frac) * x0.astype(jnp.float32)
               + frac * x1.astype(jnp.float32))
        return (out + 0.5).astype(x.dtype)  # round half up, cv2-style
    frac = frac.astype(x.dtype)
    return (1.0 - frac) * x0 + frac * x1


def crop_batch_planes(x, r, c, out_hw):
    """x (B,C,H,W), integer per-image origins r,c (B,) -> (B,C,oh,ow)."""
    oh, ow = out_hw
    H, W = x.shape[2], x.shape[3]
    if H > oh:
        x = _barrel_shift(x, r[:, None, None, None], axis=2,
                          nbits=int(H - oh).bit_length())
        x = x[:, :, :oh]  # shrink before the column rounds
    if W > ow:
        x = _barrel_shift(x, c[:, None, None, None], axis=3,
                          nbits=int(W - ow).bit_length())
        x = x[:, :, :, :ow]
    return x[:, :, :oh, :ow]


def hsv_batch_planes(x, scales):
    """HSV perturbation on (B,3,H,W) BGR planes with per-image scale vectors
    (B,3) — pure elementwise over full-lane (B,H,W) planes. Same numerics as
    hsv_perturb (the cv2-matched HWC oracle), including the H<=179 clip."""
    h, s, v = _bgr_to_hsv_chw(jnp.moveaxis(x, 1, 0))
    sh, ss, sv = (scales[:, i][:, None, None] for i in range(3))
    h = jnp.clip(h * sh, 0.0, 179.0)
    s = jnp.clip(s * ss, 0.0, 255.0)
    v = jnp.clip(v * sv, 0.0, 255.0)
    return jnp.clip(jnp.moveaxis(_hsv_to_bgr_chw(h, s, v), 0, 1), 0.0, 255.0)


def _shear_pad(rotation_tuple, H, W):
    """Static zero-margin width covering the worst-case shear displacement
    for the angle range (same bound as rotate_shear).

    The row-mixing shear's shift can leave [0, 2^nbits-1] on far margin
    columns (and, at production sizes, on a few columns of spilled content);
    empirically the output is UNCHANGED under larger pads — out-of-range
    shifts only ever touch lines whose contribution is sliced away — but the
    rotate_batch_planes shifts are clipped anyway so behaviour there is
    edge-clamped by construction, not accidental (verified identical at
    225px/15° for P=32/36/48, nbits 6/7)."""
    max_t = max(abs(rotation_tuple[0]), abs(rotation_tuple[1])) * math.pi / 180.0
    return int(math.ceil(max(math.tan(max_t / 2.0), math.sin(max_t))
                         * max(H, W) / 2.0)) + 2


def rotate_batch_planes(x, deg, rotation_tuple):
    """Per-image three-shear rotation on (B,C,H,W) planes, angles ``deg`` (B,).

    Each shear is out[i] = lerp(in[i + t]) with t = coef*(coord - centre):
    t can be negative, so the array is padded by P on both sides, statically
    rolled by +P, then barrel-shifted by t+P in [2, 2P-2] — all reads land in
    zero margins (wrap-around only ever moves zeros). Geometry matches
    rotate_shear EXACTLY (same decomposition), and the cv2-matched gather
    ``rotate`` within interpolation tolerance on the frame interior.

    Known boundary property of the three-shear family (NOT specific to this
    batched version — rotate_shear produces bit-identical values): within a
    ~1-2px band along the rotated frame edge, per-shear zero-fill lerps
    anti-alias differently from warpAffine's single gather — a ghost of up
    to ~0.2x edge intensity can appear just outside the true frame and true
    edge pixels can attenuate (~0.6% of pixels at 225px/15deg, p99 of the
    full-frame |diff| vs cv2 is <0.05). Interior pixels are exact within
    lerp rounding."""
    B, C, H, W = x.shape
    theta = deg * jnp.pi / 180.0
    a = -jnp.tan(theta / 2.0)  # (B,)
    b = jnp.sin(theta)
    cy, cx = H / 2.0, W / 2.0
    P = _shear_pad(rotation_tuple, H, W)
    # shifts land in [2, 2P-2] (coef*half-extent <= P-2 by construction of
    # _shear_pad), so the top bit of 2P is never set
    nbits = int(2 * P - 2).bit_length()

    x = jnp.pad(x, ((0, 0), (0, 0), (P, P), (P, P)))
    x_orig = jax.lax.broadcasted_iota(jnp.float32, (W + 2 * P,), 0) - P

    # clip is a safety net only: _shear_pad guarantees in-range t on every
    # content-carrying row/column; out-of-range t occurs only on all-zero
    # margin lines (where any shift is a no-op). The clip makes a future
    # pad-formula bug degrade to edge-clamped reads instead of bit-wrapped
    # garbage. t tensors are (B,1,H,1)/(B,1,1,Wp) — negligible.
    t_hi = float((1 << nbits) - 1)

    def shear_w(img, coef, y_coords):  # in_x = out_x + coef*(y - cy)
        t = coef[:, None, None, None] * (y_coords - cy)[None, None, :, None] + P
        return _shift_resample(jnp.roll(img, P, axis=3),
                               jnp.clip(t, 0.0, t_hi), axis=3, nbits=nbits)

    def shear_h(img, coef):  # in_y = out_y + coef*(x - cx)
        t = coef[:, None, None, None] * (x_orig - cx)[None, None, None, :] + P
        return _shift_resample(jnp.roll(img, P, axis=2),
                               jnp.clip(t, 0.0, t_hi), axis=2, nbits=nbits)

    y_pad = jax.lax.broadcasted_iota(jnp.float32, (H + 2 * P,), 0) - P
    y_content = jax.lax.broadcasted_iota(jnp.float32, (H,), 0)
    x = shear_w(x, a, y_pad)
    # the W-shears never mix rows, so only the H content rows survive to the
    # output — slice them off right after the row-mixing shear
    x = shear_h(x, b)[:, :, P:P + H]
    x = shear_w(x, a, y_content)
    return x[:, :, :, P:P + W]


def flip_batch_planes(x, do):
    """Per-image horizontal flip on (B,C,H,W): boolean vector select."""
    return jnp.where(do[:, None, None, None], x[..., ::-1], x)


def draw_batch_params(key, batch, precrop_hw, out_hw, hsv_pert_tuples=None,
                      rotation_tuple=None, horizontal_flip_prob=None,
                      crop_mode="random"):
    """Per-image augmentation parameters as (B,) vectors — the same
    distributions the per-image oracle path draws."""
    k_r, k_c, k_hsv, k_rot, k_flip = jax.random.split(key, 5)
    p = {}
    if crop_mode == "random":
        p["crop_r"] = jax.random.randint(
            k_r, (batch,), 0, max(precrop_hw[0] - out_hw[0], 1))
        p["crop_c"] = jax.random.randint(
            k_c, (batch,), 0, max(precrop_hw[1] - out_hw[1], 1))
    if hsv_pert_tuples is not None:
        lo = jnp.array([t[0] for t in hsv_pert_tuples], jnp.float32)
        hi = jnp.array([t[1] for t in hsv_pert_tuples], jnp.float32)
        p["hsv_scales"] = jax.random.uniform(
            k_hsv, (batch, 3), minval=lo, maxval=hi)
    if rotation_tuple is not None:
        p["deg"] = jax.random.uniform(k_rot, (batch,),
                                      minval=rotation_tuple[0],
                                      maxval=rotation_tuple[1])
    if horizontal_flip_prob is not None:
        p["flip"] = jax.random.uniform(k_flip, (batch,)) < horizontal_flip_prob
    return p


def augment_batch_planes(x, params, out_hw, hsv_pert_tuples=None,
                         rotation_tuple=None, horizontal_flip_prob=None,
                         crop_mode="random", hsv_dtype=None):
    """Whole-batch augmentation chain on (B,C,H,W) planes in the reference's
    order (crop -> HSV -> rotate -> flip), driven by explicit ``params``
    (see draw_batch_params) so it is directly testable against the per-image
    oracles. This IS the production chain — train_pipeline's planes branch
    calls it, so the oracle tests pin the shipped path.

    Spatial stages (crop/rotate/flip) run in the INPUT dtype: with uint8
    images that is 1 byte/pixel of HBM traffic, and matches cv2, which
    quantises to uint8 after every stage. HSV itself runs in ``hsv_dtype``
    for FLOAT inputs (where it is the materialised working/output
    precision). For INTEGER inputs the HSV math always runs in float32 and
    ``hsv_dtype`` is ignored: the stage rounds straight back to the input
    dtype, so the float temporaries are fusion-internal — a bf16 working
    dtype saves no HBM traffic, XLA:TPU compiles the bf16 casts with excess
    precision anyway (backend-dependent output, the same trap as the shear
    lerps — see _shift_resample), and Mosaic cannot lower bf16 comparisons
    at all ("Target does not support this comparison" on the v5e for
    _bgr_to_hsv_chw's ``diff == 0``), which broke the pallas aug kernel
    under the bf16 compute policy (PERF.md round-3 session-5)."""
    quantise = jnp.issubdtype(x.dtype, jnp.integer)
    if quantise:
        hsv_dtype = jnp.float32
    elif hsv_dtype is None:
        hsv_dtype = x.dtype
    if crop_mode == "random":
        x = crop_batch_planes(x, params["crop_r"], params["crop_c"], out_hw)
    elif crop_mode == "center":
        H, W = x.shape[2], x.shape[3]
        r0, c0 = (H - out_hw[0]) // 2, (W - out_hw[1]) // 2
        x = x[:, :, r0:r0 + out_hw[0], c0:c0 + out_hw[1]]
    if hsv_pert_tuples is not None:
        hsv = hsv_batch_planes(x.astype(hsv_dtype), params["hsv_scales"])
        # integer inputs round back (cv2 semantics); float inputs continue
        # in hsv_dtype (the float stages' working precision)
        x = (hsv + 0.5).astype(x.dtype) if quantise else hsv
    if rotation_tuple is not None:
        x = rotate_batch_planes(x, params["deg"], rotation_tuple)
    if horizontal_flip_prob is not None:
        x = flip_batch_planes(x, params["flip"])
    return x


@partial(jax.jit, static_argnames=("out_hw", "hsv_pert_tuples", "rotation_tuple",
                                   "horizontal_flip_prob", "crop_mode"))
def augment_batch(key, images, out_hw, hsv_pert_tuples=None, rotation_tuple=None,
                  horizontal_flip_prob=None, crop_mode="random"):
    """vmapped batch augmentation: images (B, H, W, C) float32 BGR [0,255] →
    (B, out_h, out_w, C) CHW-ready (caller transposes / shifts)."""
    keys = jax.random.split(key, images.shape[0])
    fn = lambda k, im: augment_image(k, im, out_hw, hsv_pert_tuples,
                                     rotation_tuple, horizontal_flip_prob,
                                     crop_mode)
    return jax.vmap(fn)(keys, images)


@jax.jit
def mixup_pair(key, X, one_hot, mixup_lo, mixup_hi):
    """Device-side mixup reproducing the reference's paired scheme
    (image_data_loader.py:100-112): draw a second 'batch' by rolling the batch
    axis, emit both convex combinations. Returns (X2B, one_hot2B)."""
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.uniform(k_lam, (), minval=mixup_lo, maxval=mixup_hi)
    perm = jax.random.permutation(k_perm, X.shape[0])
    Xm, ym = X[perm], one_hot[perm]
    lamX = lam.astype(X.dtype)  # don't let an f32 scalar upcast bf16 batches
    X_a = lamX * Xm + (1 - lamX) * X
    X_b = lamX * X + (1 - lamX) * Xm
    y_a = lam * ym + (1 - lam) * one_hot
    y_b = lam * one_hot + (1 - lam) * ym
    return jnp.concatenate([X_a, X_b]), jnp.concatenate([y_a, y_b])


def train_pipeline(key, images_precrop, one_hot, out_hw,
                   hsv_pert_tuples=None, rotation_tuple=None,
                   horizontal_flip_prob=None, crop_mode="random",
                   mixup=None, output_layout="NCHW", internal_layout="planes",
                   aug_dtype=None, use_pallas_aug=None):
    """precrop-size BGR batch (B,H,W,C in [0,255]) → augmented, optionally
    mixed-up, -128-shifted training batch in one jitted program.
    output_layout="NHWC" pairs with Trainer(input_layout="NHWC") to avoid a
    round-trip transpose (NHWC is the internal compute layout).

    internal_layout="planes" (default) is the batched barrel-shift pipeline —
    no per-image vmap, no gathers; "HWC"/"CHW" are the round-1 vmapped
    per-image paths kept as oracles.

    aug_dtype (planes path only): dtype for the float stages (HSV/rotation/
    flip/mixup) and the emitted batch. Default None follows the compute-dtype
    policy (set_compute_dtype) — fp32 under the parity default, bfloat16
    under the production policy (where it halves HBM traffic; its ~0.4%
    rounding is below the uint8 quantisation the reference's cv2 path
    applies after every stage). Pass uint8 images to keep the crop stage
    (and the host->device copy) at 1 byte/pixel; aug_dtype="float32" forces
    oracle-exact numerics regardless of policy."""
    if aug_dtype is None:
        # resolved OUTSIDE the jitted impl: the resolved name is part of the
        # static trace key, so flipping the policy retraces instead of
        # silently reusing a stale-dtype program
        from dorknet_tpu.config import get_compute_dtype

        aug_dtype = jnp.dtype(get_compute_dtype()).name
    if use_pallas_aug is None:
        # same stale-trace discipline as aug_dtype: the pallas gate is read
        # here, not inside the cached jit. As the STANDALONE aug program the
        # kernel defaults ON for TPU backends — wall-confirmed 1.6x win over
        # the planes path, output parity within 1 uint8 step (PERF.md
        # round-3 session-5); config.set_use_pallas_aug(False) restores the
        # planes path. Backend-guarded like the conv gate (ops/conv.py):
        # on non-TPU backends every config setting falls back to the XLA
        # planes path instead of failing to compile (only the explicit
        # per-call argument bypasses, for interpret-mode tests). Sharded
        # inputs also fall back: pallas_call has no SPMD partitioning rule,
        # so GSPMD would all-gather the batch to every device and redo the
        # full-batch aug grid per replica (the Trainer applies the same
        # guard for its sharded step traces).
        from dorknet_tpu.config import use_pallas_aug as _aug_gate

        tri = _aug_gate()
        use_pallas_aug = (True if tri is None else tri) and \
            jax.default_backend() == "tpu"
        s = getattr(images_precrop, "sharding", None)
        if s is not None and len(getattr(s, "device_set", ())) > 1:
            use_pallas_aug = False
    return _train_pipeline_impl(key, images_precrop, one_hot, out_hw,
                                hsv_pert_tuples, rotation_tuple,
                                horizontal_flip_prob, crop_mode, mixup,
                                output_layout, internal_layout, aug_dtype,
                                use_pallas_aug)


@partial(jax.jit, static_argnames=("out_hw", "hsv_pert_tuples", "rotation_tuple",
                                   "horizontal_flip_prob", "crop_mode", "mixup",
                                   "output_layout", "internal_layout",
                                   "aug_dtype", "use_pallas_aug"))
def _train_pipeline_impl(key, images_precrop, one_hot, out_hw,
                         hsv_pert_tuples, rotation_tuple,
                         horizontal_flip_prob, crop_mode,
                         mixup, output_layout, internal_layout, aug_dtype,
                         use_pallas_aug=False):
    k_aug, k_mix = jax.random.split(key)
    if internal_layout == "planes":
        x = jnp.transpose(images_precrop, (0, 3, 1, 2))
        params = draw_batch_params(k_aug, x.shape[0], x.shape[2:], out_hw,
                                   hsv_pert_tuples, rotation_tuple,
                                   horizontal_flip_prob, crop_mode)
        if use_pallas_aug and x.dtype == jnp.uint8:
            # one VMEM-resident kernel for crop+HSV+rotation instead of the
            # barrel-shift round chain (ops/pallas/augment.py); flip rides
            # along inside augment_planes_fused as the XLA select pass
            from dorknet_tpu.ops.pallas.augment import augment_planes_fused

            x = augment_planes_fused(x, params, out_hw, hsv_pert_tuples,
                                     rotation_tuple, horizontal_flip_prob,
                                     crop_mode, hsv_dtype=aug_dtype)
        else:
            x = augment_batch_planes(x, params, out_hw, hsv_pert_tuples,
                                     rotation_tuple, horizontal_flip_prob,
                                     crop_mode, hsv_dtype=aug_dtype)
        x = x.astype(aug_dtype) - 128.0
        if mixup is not None:
            x, one_hot = mixup_pair(k_mix, x, one_hot,
                                    float(mixup[0]), float(mixup[1]))
        if output_layout == "NHWC":
            x = jnp.transpose(x, (0, 2, 3, 1))
        return x, one_hot
    if internal_layout == "CHW":
        # experimental: C=3 in the lane dim wastes most of the VPU; W-in-lanes
        # avoids that but the per-row resampling pattern changes too —
        # benchmark both on your hardware (the tunnel here was too noisy to
        # pick a universal winner)
        x = jnp.transpose(images_precrop, (0, 3, 1, 2))
        keys = jax.random.split(k_aug, x.shape[0])
        fn = lambda k, im: augment_image_chw(k, im, out_hw, hsv_pert_tuples,
                                             rotation_tuple,
                                             horizontal_flip_prob, crop_mode)
        x = jax.vmap(fn)(keys, x)
        x = x - 128.0
        if mixup is not None:
            x, one_hot = mixup_pair(k_mix, x, one_hot,
                                    float(mixup[0]), float(mixup[1]))
        if output_layout == "NHWC":
            x = jnp.transpose(x, (0, 2, 3, 1))
        return x, one_hot
    x = augment_batch(k_aug, images_precrop, out_hw, hsv_pert_tuples,
                      rotation_tuple, horizontal_flip_prob, crop_mode)
    x = x - 128.0
    if mixup is not None:
        x, one_hot = mixup_pair(k_mix, x, one_hot, float(mixup[0]), float(mixup[1]))
    if output_layout == "NCHW":
        x = jnp.transpose(x, (0, 3, 1, 2))
    return x, one_hot
