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


def augment_image(key, im, out_hw, hsv_pert_tuples=None, rotation_tuple=None,
                  horizontal_flip_prob=None, crop_mode="random"):
    """Full per-image augmentation chain in the reference's order
    (crop happens in the preprocessor before augment: resize→crop→HSV→rot→flip)."""
    k_crop, k_hsv, k_rot, k_flip = jax.random.split(key, 4)
    if crop_mode == "random":
        im = random_crop(k_crop, im, out_hw)
    elif crop_mode == "center":
        im = center_crop(im, out_hw)
    if hsv_pert_tuples is not None:
        im = hsv_perturb(k_hsv, im, hsv_pert_tuples)
    if rotation_tuple is not None:
        im = rotate(k_rot, im, rotation_tuple)
    if horizontal_flip_prob is not None:
        im = horizontal_flip(k_flip, im, horizontal_flip_prob)
    return im


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
    X_a = lam * Xm + (1 - lam) * X
    X_b = lam * X + (1 - lam) * Xm
    y_a = lam * ym + (1 - lam) * one_hot
    y_b = lam * one_hot + (1 - lam) * ym
    return jnp.concatenate([X_a, X_b]), jnp.concatenate([y_a, y_b])


@partial(jax.jit, static_argnames=("out_hw", "hsv_pert_tuples", "rotation_tuple",
                                   "horizontal_flip_prob", "crop_mode", "mixup",
                                   "output_layout"))
def train_pipeline(key, images_precrop, one_hot, out_hw,
                   hsv_pert_tuples=None, rotation_tuple=None,
                   horizontal_flip_prob=None, crop_mode="random",
                   mixup=None, output_layout="NCHW"):
    """precrop-size BGR batch (B,H,W,C in [0,255]) → augmented, optionally
    mixed-up, -128-shifted float32 training batch in one jitted program.
    output_layout="NHWC" pairs with Trainer(input_layout="NHWC") to avoid a
    round-trip transpose (NHWC is the internal compute layout)."""
    k_aug, k_mix = jax.random.split(key)
    x = augment_batch(k_aug, images_precrop, out_hw, hsv_pert_tuples,
                      rotation_tuple, horizontal_flip_prob, crop_mode)
    x = x - 128.0
    if mixup is not None:
        x, one_hot = mixup_pair(k_mix, x, one_hot, float(mixup[0]), float(mixup[1]))
    if output_layout == "NCHW":
        x = jnp.transpose(x, (0, 3, 1, 2))
    return x, one_hot
