"""Fused whole-image augmentation kernel: crop + HSV + three-shear rotation
in ONE VMEM-resident Pallas program per image.

Why: the XLA planes pipeline (data_loading/device_augment.py) implements every
data-dependent spatial move as barrel-shift rounds — ~21 roll+select passes
per image for the rotation plus the crop rounds — and XLA materialises most
rounds to HBM (fusing a depth-7 select/roll DAG would multiply reads), so the
aug program costs ~1.12x a full train step per trained image and nearly
halves chained input-pipeline->train throughput. This kernel holds one
image's planes in VMEM and runs the SAME algorithm (crop_batch_planes'
barrel-shift crop in-register — Mosaic rejects dynamic-origin ref reads as
not tile-aligned — cv2-matched HSV, the identical three-shear barrel-shift
rotation with fp32 lerps matching XLA's excess-precision bf16 numerics, see
_shift_resample_kernel) with two HBM passes total: read the uint8 precrop
image, write the uint8 augmented image.

Parity: stage order, dtypes and rounding follow augment_batch_planes
bit-for-bit (same _shear_pad geometry, same clip semantics); the horizontal
flip stays OUTSIDE the kernel (flip_batch_planes — Mosaic cannot extract
negative-stride vector slices, and the flip is one cheap select pass).
Reference analogue: the cv2 host augmenter
(/root/reference/data_loading/image_augmentation.py:16-72) it reproduces.

uint8 images only (the production path — emit_hwc_uint8 loaders); float
batches fall back to the XLA planes pipeline. Gated by
``config.set_use_pallas_aug`` (tri-state) / the ``use_pallas_aug`` argument
of ``train_pipeline``. Per-site defaults from the on-chip A/B (PERF.md
round-3 session-5): ON inside standalone aug programs on TPU backends
(2.2x device win), OFF inside Trainer.step_augmented's fused step (3.0x
device loss in-program); ``set_use_pallas_aug(False)`` restores the planes
path everywhere (e.g. for oracle comparisons).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # set True in tests on CPU


def _hsv_apply(x_float, sh, ss, sv):
    """cv2-matched HSV perturbation on one (3, H, W) float BGR image —
    identical math to device_augment.hsv_batch_planes (the float working
    dtype is the caller's choice, mirroring that path's hsv_dtype)."""
    from dorknet_tpu.data_loading.device_augment import (_bgr_to_hsv_chw,
                                                         _hsv_to_bgr_chw)

    h, s, v = _bgr_to_hsv_chw(x_float)
    h = jnp.clip(h * sh, 0.0, 179.0)
    s = jnp.clip(s * ss, 0.0, 255.0)
    v = jnp.clip(v * sv, 0.0, 255.0)
    return jnp.clip(_hsv_to_bgr_chw(h, s, v), 0.0, 255.0)


def _u8_to_float(x, dt):
    """uint8 -> float via int32 (Mosaic has no direct uint8<->float casts)."""
    return x.astype(jnp.int32).astype(dt)


def _float_to_u8(x):
    """float -> uint8 via int32 truncation, clamped to [0, 255] first.

    The clamp is load-bearing: XLA's direct float->uint8 cast SATURATES
    out-of-range values but an int32->uint8 cast WRAPS — one wrapped pixel
    then smears through the remaining shear lerps (found as a
    content-dependent 2x2 mismatch cluster vs the planes path back when the
    lerps ran in bf16, where round-half-up could hit 256; fp32 lerps make
    that edge unreachable from <=255 endpoints, but the clamp stays as the
    wrap guard for the HSV stage's arithmetic)."""
    return jnp.clip(x, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def _shift_resample_kernel(x, t_float, axis, nbits):
    """device_augment._shift_resample (uint8 path): shift rounds at 1
    byte/pixel, lerp, cv2-style round-half-up back to the input dtype.
    The barrel shift itself is IMPORTED from device_augment (pure jnp,
    Mosaic-compatible as-is). The lerp runs in FLOAT32 even though the
    planes path writes bf16 casts: XLA compiles those bf16 chains with
    excess precision (fp32 inside the fusion, one rounding at the uint8
    store — the TPU toolchain runs --xla_allow_excess_precision=true), and
    Mosaic executes literal bf16 vector ops. A literal-bf16 kernel measured
    59% of pixels off by up to 6 uint8 steps AGAINST THE PLANES PATH ON
    CHIP while interpret mode (where XLA treats both paths alike) was
    bit-exact — PERF.md round-3 session-4/5. fp32 lerps reproduce the
    planes path's effective numerics on both backends;
    test_pallas_augment_matches_planes pins the equality in CI."""
    from dorknet_tpu.data_loading.device_augment import _barrel_shift

    t0 = jnp.floor(t_float)
    frac = t_float - t0
    x0 = _barrel_shift(x, t0.astype(jnp.int32), axis, nbits)
    x1 = jnp.roll(x0, -1, axis=axis)
    if jnp.issubdtype(x.dtype, jnp.integer):
        frac = frac.astype(jnp.float32)
        out = ((1.0 - frac) * _u8_to_float(x0, jnp.float32)
               + frac * _u8_to_float(x1, jnp.float32))
        return _float_to_u8(out + 0.5)
    frac = frac.astype(x.dtype)
    return (1.0 - frac) * x0 + frac * x1


def _rotate_one(x, deg, P, nbits, out_hw):
    """rotate_batch_planes for a single (3, oh, ow) image value (same
    decomposition, pads, clips — see that docstring for the boundary-band
    property the oracle tests pin)."""
    oh, ow = out_hw
    theta = deg * jnp.pi / 180.0
    a = -jnp.tan(theta / 2.0)
    b = jnp.sin(theta)
    cy, cx = oh / 2.0, ow / 2.0

    x = jnp.pad(x, ((0, 0), (P, P), (P, P)))
    t_hi = float((1 << nbits) - 1)

    # 2D INTEGER iotas cast to f32 (Mosaic's tpu.iota is integer-only, and
    # 1D iota is unsupported on TPU)
    def fiota(shape, dim):
        return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
            jnp.float32)

    y_pad = fiota((oh + 2 * P, 1), 0) - P
    y_content = fiota((oh, 1), 0)
    x_orig = fiota((1, ow + 2 * P), 1) - P

    def shear_w(img, coef, y_coords):  # in_x = out_x + coef*(y - cy)
        t = (coef * (y_coords - cy) + P)[None, :, :]  # (1, H', 1)
        return _shift_resample_kernel(jnp.roll(img, P, axis=2),
                                      jnp.clip(t, 0.0, t_hi), axis=2,
                                      nbits=nbits)

    def shear_h(img, coef):  # in_y = out_y + coef*(x - cx)
        t = (coef * (x_orig - cx) + P)[None, :, :]  # (1, 1, W')
        return _shift_resample_kernel(jnp.roll(img, P, axis=1),
                                      jnp.clip(t, 0.0, t_hi), axis=1,
                                      nbits=nbits)

    x = shear_w(x, a, y_pad)
    x = shear_h(x, b)[:, P:P + oh]
    x = shear_w(x, a, y_content)
    return x[:, :, P:P + ow]


def _aug_kernel(params_ref, x_ref, o_ref, *, out_hw, crop_mode, hsv_on,
                rot_on, P, nbits):
    # params_ref is a scalar-prefetch arg: the FULL (B, 8) table in SMEM,
    # indexed by this grid step's image id (the (1, 8)-block alternative is
    # not a legal SMEM BlockSpec — Mosaic wants block dims divisible by the
    # tile or equal to the array's)
    i = pl.program_id(0)
    oh, ow = out_hw
    H, W = x_ref.shape[2], x_ref.shape[3]

    # Crop on the VALUE, not the ref: a dynamic-origin ref read
    # (x_ref[0, :, pl.ds(r, oh), pl.ds(c, ow)]) passes Mosaic's front-end but
    # the real libtpu AOT compile rejects it — "cannot statically prove that
    # index in dimension 2 is a multiple of 8" (a random crop origin is not
    # sublane/lane-tile-aligned; found on-chip, PERF.md round-3 session-4).
    # The whole image block is VMEM-resident anyway, so run
    # crop_batch_planes' own formulation in-register instead: barrel shift by
    # the origin, then slice from 0 (every remaining offset static + aligned).
    # Identical wrap/zero-fill semantics => still bit-exact vs the planes
    # path.
    from dorknet_tpu.data_loading.device_augment import _barrel_shift

    if crop_mode == "random" and (H > oh or W > ow):
        r = params_ref[i, 0].astype(jnp.int32)
        c = params_ref[i, 1].astype(jnp.int32)
        x = x_ref[0]  # full (3, H, W) block: static, tile-aligned read
        if H > oh:
            x = _barrel_shift(x, r, axis=1,
                              nbits=int(H - oh).bit_length())[:, :oh]
        if W > ow:
            x = _barrel_shift(x, c, axis=2,
                              nbits=int(W - ow).bit_length())[:, :, :ow]
    elif H > oh or W > ow:  # center: static roll keeps the slice at origin 0
        x = x_ref[0]
        if H > oh:
            x = jnp.roll(x, -((H - oh) // 2), axis=1)[:, :oh]
        if W > ow:
            x = jnp.roll(x, -((W - ow) // 2), axis=2)[:, :, :ow]
    else:
        x = x_ref[0]  # (3, oh, ow) uint8

    if hsv_on:
        # HSV math is pinned to fp32, mirroring augment_batch_planes, which
        # ignores hsv_dtype for integer inputs (the kernel is uint8-only):
        # the temporaries are VMEM-internal so bf16 saves nothing, and
        # Mosaic cannot lower bf16 comparisons (_bgr_to_hsv_chw's
        # ``diff == 0`` fails "Target does not support this comparison" on
        # the v5e — found on-chip under the bf16 compute policy, PERF.md
        # round-3 session-5).
        hsv = _hsv_apply(_u8_to_float(x, jnp.float32), params_ref[i, 2],
                         params_ref[i, 3], params_ref[i, 4])
        x = _float_to_u8(hsv + 0.5)  # cv2 quantises after every stage

    if rot_on:
        x = _rotate_one(x, params_ref[i, 5], P, nbits, out_hw)

    o_ref[0] = x


def augment_planes_fused(x, params, out_hw, hsv_pert_tuples=None,
                         rotation_tuple=None, horizontal_flip_prob=None,
                         crop_mode="random", hsv_dtype=None):
    """Drop-in for device_augment.augment_batch_planes on uint8 (B,3,H,W)
    batches: one fused Pallas dispatch for crop+HSV+rotation (grid = one
    image per step), then the XLA flip select. ``params`` comes from
    draw_batch_params; ``hsv_dtype`` exists for drop-in parity with that
    path's signature — both ignore it for integer inputs (HSV math is
    always fp32 there, see augment_batch_planes)."""
    from dorknet_tpu.data_loading.device_augment import (_shear_pad,
                                                         flip_batch_planes)

    assert x.dtype == jnp.uint8, (
        "pallas augment is the uint8 production path (the kernel's rounding "
        "clamps to [0, 255]); other dtypes use the XLA planes pipeline")
    if crop_mode not in ("random", "center") and x.shape[2:] != tuple(out_hw):
        # the planes path applies NO crop for other crop modes — the kernel
        # has no no-crop-with-resize notion, so keep the drop-in contract by
        # falling back rather than silently centre-cropping
        from dorknet_tpu.data_loading.device_augment import \
            augment_batch_planes

        return augment_batch_planes(x, params, out_hw, hsv_pert_tuples,
                                    rotation_tuple, horizontal_flip_prob,
                                    crop_mode, hsv_dtype=hsv_dtype)
    if hsv_pert_tuples is None and rotation_tuple is None:
        # crop(/flip)-only: nothing to fuse — the kernel would be a bare
        # uint8 copy (which the interpret-mode CPU compiler also rejects);
        # the XLA path is already one cheap pass here
        from dorknet_tpu.data_loading.device_augment import \
            augment_batch_planes

        return augment_batch_planes(x, params, out_hw, hsv_pert_tuples,
                                    rotation_tuple, horizontal_flip_prob,
                                    crop_mode, hsv_dtype=hsv_dtype)
    B, C, H, W = x.shape
    oh, ow = out_hw

    # VMEM-bound guard (same discipline as ops/conv.py's _vmem_ok): beyond
    # the flagship's sizes the per-image working set (fp32 HSV temporaries +
    # padded fp32 shear-lerp planes + the uint8 input block) overflows ~16 MB of
    # VMEM and Mosaic fails the whole compile — fall back to the XLA planes
    # path instead. Conservative live-set model: 6 fp32 HSV temps on the
    # crop + 4 fp32 lerp temps on the padded rotation planes + input + output
    # (+ 2 full-size uint8 barrel-shift temps from the in-register crop).
    Pg = (_shear_pad(rotation_tuple, oh, ow)
          if rotation_tuple is not None else 0)
    _vmem_est = (6 * C * oh * ow * 4
                 + 4 * C * (oh + 2 * Pg) * (ow + 2 * Pg) * 4
                 + 3 * C * H * W + C * oh * ow)
    if _vmem_est > 10 * 1024 * 1024:
        from dorknet_tpu.data_loading.device_augment import \
            augment_batch_planes

        return augment_batch_planes(x, params, out_hw, hsv_pert_tuples,
                                    rotation_tuple, horizontal_flip_prob,
                                    crop_mode, hsv_dtype=hsv_dtype)

    # per-image scalar params packed as one (B, 8) fp32 row
    pvec = jnp.zeros((B, 8), jnp.float32)
    if crop_mode == "random":
        pvec = pvec.at[:, 0].set(params["crop_r"].astype(jnp.float32))
        pvec = pvec.at[:, 1].set(params["crop_c"].astype(jnp.float32))
    if hsv_pert_tuples is not None:
        pvec = pvec.at[:, 2:5].set(params["hsv_scales"])
    if rotation_tuple is not None:
        pvec = pvec.at[:, 5].set(params["deg"])
        P = _shear_pad(rotation_tuple, oh, ow)
        nbits = int(2 * P - 2).bit_length()
    else:
        P, nbits = 0, 0

    # hsv_dtype is accepted for drop-in parity with augment_batch_planes
    # (and forwarded on the fallback paths above) but the kernel itself
    # always runs HSV in fp32 — see the _aug_kernel comment
    kernel = partial(_aug_kernel, out_hw=(oh, ow), crop_mode=crop_mode,
                     hsv_on=hsv_pert_tuples is not None,
                     rot_on=rotation_tuple is not None, P=P, nbits=nbits)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # pvec: full (B, 8) table in SMEM
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, C, H, W), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, C, oh, ow), lambda i, *_: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, oh, ow), x.dtype),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=B * C * oh * ow * (3 * nbits + 60),
            bytes_accessed=B * C * (H * W + oh * ow),
            transcendentals=0),
    )(pvec, x)

    if horizontal_flip_prob is not None:
        out = flip_batch_planes(out, params["flip"])
    return out
