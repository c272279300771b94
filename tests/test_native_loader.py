"""Native C++ loader (native/dorknet_loader.cpp) vs the cv2 reference path."""

import os

import cv2
import numpy as np
import pytest

from dorknet_tpu.native import native_loader_available, build_native

_build_err = ""
if not native_loader_available():
    try:
        build_native()
    except Exception as e:  # surface WHY in the skip reason — a silent
        _build_err = ": {}: {}".format(type(e).__name__, e)  # green skip
        # would hide a compile regression of the C++ loader

pytestmark = pytest.mark.skipif(not native_loader_available(),
                                reason="native loader not built" + _build_err)


@pytest.fixture
def img_paths(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(8):
        im = rng.randint(0, 255, (120, 160, 3), dtype=np.uint8)
        p = str(tmp_path / (f"{i}.jpg" if i % 2 == 0 else f"{i}.png"))
        cv2.imwrite(p, im)
        paths.append(p)
    return paths


def test_decode_batch_matches_cv2_preprocessor(img_paths):
    from dorknet_tpu.native import decode_batch
    from dorknet_tpu.data_loading import ImagePreprocessor

    out, ok = decode_batch(img_paths, (100, 100), (80, 80), "center")
    assert ok == 8
    assert out.shape == (8, 3, 80, 80) and out.dtype == np.float32
    pp = ImagePreprocessor((80, 80), crop_mode="center", precrop_size=(100, 100))
    for i in [1, 3]:  # PNGs: lossless, decode must agree
        ref = pp.load_image(img_paths[i])
        assert np.abs(out[i] - ref).max() <= 1.0  # rounding convention only
        assert np.abs(out[i] - ref).mean() < 0.2


def test_decode_batch_hwc(img_paths):
    from dorknet_tpu.native import decode_batch_hwc

    out, ok = decode_batch_hwc(img_paths, (64, 64))
    assert ok == 8
    assert out.shape == (8, 64, 64, 3) and out.dtype == np.uint8


def test_decode_failure_leaves_zeros(tmp_path, img_paths):
    from dorknet_tpu.native import decode_batch

    bad = str(tmp_path / "nope.jpg")
    open(bad, "wb").write(b"not an image")
    out, ok = decode_batch([img_paths[0], bad], (32, 32), (24, 24), "center")
    assert ok == 1
    assert (out[1] == 0).all()


def test_image_data_loader_native_path(tmp_path, img_paths):
    from dorknet_tpu.data_loading import ImageDataLoader, ImagePreprocessor

    for c, grp in [("a", img_paths[:4]), ("b", img_paths[4:])]:
        d = tmp_path / "ds" / c / "images"
        d.mkdir(parents=True)
        for p in grp:
            os.link(p, d / os.path.basename(p))
    pp = ImagePreprocessor((32, 32), crop_mode="random")
    loader = ImageDataLoader(str(tmp_path / "ds"), batch_size=4,
                             preprocessor=pp, use_native_loader=True)
    try:
        assert loader.use_native_loader
        X, y, oh = next(iter(loader.pull_batch(1)))
        assert X.shape == (4, 3, 32, 32)
        assert X.dtype == np.float32
        assert not (X == 0).all()
    finally:
        loader.stop_thread()


def test_async_decode_pool_matches_sync(img_paths):
    from dorknet_tpu.native import AsyncDecodePool, decode_batch

    pool = AsyncDecodePool(threads=2)
    try:
        # pipeline two jobs
        j1 = pool.submit(img_paths[:4], (100, 100), (80, 80), "center")
        j2 = pool.submit(img_paths[4:], (100, 100), (80, 80), "center")
        b1, ok1 = pool.wait(j1)
        b2, ok2 = pool.wait(j2)
        assert ok1 == 4 and ok2 == 4
        ref1, _ = decode_batch(img_paths[:4], (100, 100), (80, 80), "center")
        np.testing.assert_array_equal(b1, ref1)
        assert b2.shape == (4, 3, 80, 80)
    finally:
        pool.close()


def test_async_pool_bad_file_and_unknown_job(tmp_path, img_paths):
    from dorknet_tpu.native import AsyncDecodePool

    bad = str(tmp_path / "bad.jpg")
    open(bad, "wb").write(b"garbage")
    pool = AsyncDecodePool(threads=1)
    try:
        j = pool.submit([img_paths[0], bad], (32, 32), (24, 24), "center")
        batch, ok = pool.wait(j)
        assert ok == 1 and (batch[1] == 0).all()
        import pytest as _pt
        with _pt.raises(KeyError):
            pool.poll(999)
    finally:
        pool.close()


def test_async_pool_released_after_poll(img_paths):
    """Regression: completed jobs are released (no unbounded Pool::jobs growth);
    polling a released id raises like an unknown id."""
    from dorknet_tpu.native import AsyncDecodePool

    pool = AsyncDecodePool(threads=1)
    try:
        j = pool.submit(img_paths[:2], (32, 32), (24, 24), "center")
        batch, ok = pool.wait(j)
        assert ok == 2
        import pytest as _pt
        with _pt.raises(KeyError):
            pool.poll(j)  # released
    finally:
        pool.close()


def _write_adam7_png(path, rgb):
    """Hand-write a REAL Adam7-interlaced PNG (Pillow silently ignores its
    unsupported ``interlace=True`` save kwarg, which made the previous
    version of this test exercise a plain PNG)."""
    import struct
    import zlib

    h, w = rgb.shape[:2]

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    # IHDR: bit depth 8, colour type 2 (RGB), interlace = 1 (Adam7)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    # Adam7 passes: (x_start, y_start, x_step, y_step)
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        ys = range(y0, h, dy)
        xs = range(x0, w, dx)
        if not ys or not xs:
            continue
        for y in ys:
            raw.append(0)  # filter: None
            for x in xs:
                raw.extend(rgb[y, x].tobytes())
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(data)


def test_interlaced_png_decodes(tmp_path):
    """Regression: Adam7-interlaced PNGs must decode identically to cv2."""
    import cv2
    from dorknet_tpu.native import decode_batch

    rng = np.random.RandomState(5)
    arr = rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)  # RGB
    p = str(tmp_path / "interlaced.png")
    _write_adam7_png(p, arr)
    # sanity: the file really is interlaced (IHDR interlace byte == 1)...
    with open(p, "rb") as f:
        header = f.read(33)
    assert header[28] == 1, "fixture is not Adam7-interlaced"
    # ...and cv2 decodes it back to the exact pixels (BGR order)
    ref = cv2.imread(p)
    assert ref is not None
    np.testing.assert_array_equal(ref, arr[:, :, ::-1])
    out, ok = decode_batch([p], (40, 40), (40, 40), "resize")
    assert ok == 1
    got = out[0].transpose(1, 2, 0) + 128.0
    np.testing.assert_allclose(got, ref.astype(np.float32), atol=1.0)


def test_pool_poll_then_wait_flow(img_paths):
    """Regression: the documented poll-until-done -> wait flow must work —
    the native poll releases the job on first 'done', so Python caches
    completion instead of issuing a second destructive native poll."""
    import time
    from dorknet_tpu.native import AsyncDecodePool

    pool = AsyncDecodePool(threads=1)
    try:
        j = pool.submit(img_paths[:2], (32, 32), (24, 24), "center")
        deadline = time.monotonic() + 30
        while True:
            done, ok = pool.poll(j)
            if done:
                break
            assert time.monotonic() < deadline
            time.sleep(0.001)
        done2, ok2 = pool.poll(j)  # repeat polls stay safe
        assert done2 and ok2 == ok == 2
        batch, ok3 = pool.wait(j)  # and the batch is still collectable
        assert ok3 == 2 and batch.shape == (2, 3, 24, 24)
        # ids are reused after release — a fresh submit must start clean
        j2 = pool.submit(img_paths[:1], (32, 32), (24, 24), "center")
        batch2, okb = pool.wait(j2)
        assert okb == 1
    finally:
        pool.close()


def test_crop_larger_than_precrop_raises(img_paths):
    from dorknet_tpu.native import decode_batch, AsyncDecodePool

    with pytest.raises(ValueError, match="larger than precrop"):
        decode_batch(img_paths[:1], (20, 20), (24, 24), "center")
    pool = AsyncDecodePool(threads=1)
    try:
        with pytest.raises(ValueError, match="larger than precrop"):
            pool.submit(img_paths[:1], (20, 20), (24, 24), "random")
    finally:
        pool.close()


def test_dimension_bomb_png_zero_fills(tmp_path, img_paths):
    """A crafted PNG declaring 100000x100000 (30 GB) must zero-fill, not
    bad_alloc->std::terminate the process from the OpenMP region."""
    import struct
    import zlib
    from dorknet_tpu.native import decode_batch

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 100000, 100000, 8, 2, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b""))
    p = str(tmp_path / "bomb.png")
    with open(p, "wb") as f:
        f.write(bomb)

    out, ok = decode_batch([p, img_paths[0]], (32, 32), (24, 24), "center")
    assert ok == 1                       # the bomb failed, the real one decoded
    assert np.all(out[0] == 0.0)         # zero-filled slot
    assert np.any(out[1] != 0.0)


def test_nonsquare_crop_matches_cv2_path(tmp_path):
    """Both decode paths must agree on axis order for NON-square sizes: the
    cv2 path crops image_size[0] rows x image_size[1] cols (reference
    indexing) and the native call now passes the same (rows, cols) order —
    previously the two paths produced transposed shapes."""
    import cv2
    from dorknet_tpu.data_loading import ImagePreprocessor
    from dorknet_tpu.native import decode_batch

    rng = np.random.RandomState(3)
    im = rng.randint(0, 255, (100, 140, 3), dtype=np.uint8)
    p = str(tmp_path / "ns.png")
    cv2.imwrite(p, im)

    # explicit precrop: the reference's 1.25x default combined with its
    # swapped-axis cropping is only self-consistent for square sizes
    pp = ImagePreprocessor(image_size=(24, 32), crop_mode="center",
                           precrop_size=(44, 36))
    host = pp.load_image(p)  # (3, 24 rows, 32 cols)
    out, ok = decode_batch([p], (pp.precrop_size[1], pp.precrop_size[0]),
                           (pp.image_size[0], pp.image_size[1]), "center")
    assert ok == 1
    assert out[0].shape == host.shape, (out[0].shape, host.shape)
    np.testing.assert_allclose(out[0], host, atol=2.0)  # resize rounding


def test_fast_jpeg_scale_decode(tmp_path):
    """fast_scale=True: JPEGs decode at the smallest covering DCT scale,
    stay close to the exact full-decode path on smooth content, and keep
    the exact output geometry. PNGs are unaffected (always full decode)."""
    from dorknet_tpu.native import decode_batch, decode_batch_hwc

    # smooth gradient photos (noise images would legitimately differ a lot
    # under a different low-pass: DCT scaling averages, bilinear picks) —
    # 600x520 -> precrop 160 engages a 3/8 scale
    yy, xx = np.mgrid[0:520, 0:600]
    base = np.stack([(xx * 0.4) % 256, (yy * 0.4) % 256,
                     ((xx + yy) * 0.2) % 256], -1).astype(np.uint8)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"big{i}.jpg")
        cv2.imwrite(p, np.roll(base, i * 11, axis=1))
        paths.append(p)
    png = str(tmp_path / "big.png")
    cv2.imwrite(png, base)
    paths.append(png)

    exact, ok1 = decode_batch(paths, (160, 160), (128, 128), "center")
    fast, ok2 = decode_batch(paths, (160, 160), (128, 128), "center",
                             fast_scale=True)
    assert ok1 == ok2 == len(paths)
    assert exact.shape == fast.shape
    # smooth content: the two resampling routes agree closely
    diff = np.abs(exact - fast)
    assert diff.mean() < 3.0, diff.mean()
    assert np.percentile(diff, 99) < 16.0, np.percentile(diff, 99)
    # the png slot is bit-identical (no scaled decode path exists for png)
    np.testing.assert_array_equal(exact[3], fast[3])

    # hwc (on-device-augmentation) variant too
    e_hwc, _ = decode_batch_hwc(paths, (160, 160))
    f_hwc, _ = decode_batch_hwc(paths, (160, 160), fast_scale=True)
    assert e_hwc.shape == f_hwc.shape
    assert np.abs(e_hwc.astype(np.int32)
                  - f_hwc.astype(np.int32)).mean() < 3.0
    np.testing.assert_array_equal(e_hwc[3], f_hwc[3])

    # images already smaller than 8/7 of the target: fast == exact
    # bit-for-bit (scale stays 8/8, same decode)
    small = str(tmp_path / "small.jpg")
    cv2.imwrite(small, base[:170, :170])
    es, _ = decode_batch([small], (160, 160), (128, 128), "center")
    fs, _ = decode_batch([small], (160, 160), (128, 128), "center",
                         fast_scale=True)
    np.testing.assert_array_equal(es, fs)


def test_fast_jpeg_scale_loader_and_pool(tmp_path):
    """fast_jpeg_scale threads through ImageDataLoader and AsyncDecodePool."""
    from dorknet_tpu.data_loading import ImageDataLoader, ImagePreprocessor
    from dorknet_tpu.native import AsyncDecodePool, decode_batch

    yy, xx = np.mgrid[0:400, 0:400]
    im = np.stack([(xx * 0.5) % 256, (yy * 0.5) % 256, (xx * 0.3) % 256],
                  -1).astype(np.uint8)
    for cls in range(2):
        d = tmp_path / f"class{cls}" / "images"
        d.mkdir(parents=True)
        for i in range(4):
            cv2.imwrite(str(d / f"{i}.jpg"), np.roll(im, i * 7, axis=0))

    pp = ImagePreprocessor((96, 96), crop_mode="center",
                           precrop_size=(120, 120))
    loader = ImageDataLoader(str(tmp_path), batch_size=4, preprocessor=pp,
                             class_balance=False, num_workers=1,
                             use_native_loader=True, fast_jpeg_scale=True)
    try:
        assert loader.use_native_loader and loader.fast_jpeg_scale
        X, y, oh = next(iter(loader.pull_batch(1)))
        assert X.shape == (4, 3, 96, 96) and np.isfinite(X).all()
        assert X.std() > 1.0  # decoded content, not zero-fill
    finally:
        loader.stop_thread()

    # pool submit(fast_scale=True) matches the sync fast path bit-for-bit
    paths = sorted(str(p) for p in (tmp_path / "class0" / "images").iterdir())
    want, _ = decode_batch(paths, (120, 120), (96, 96), "center",
                           fast_scale=True)
    pool = AsyncDecodePool(threads=2)
    try:
        job = pool.submit(paths, (120, 120), (96, 96), "center",
                          fast_scale=True)
        got, ok = pool.wait(job)
    finally:
        pool.close()
    assert ok == len(paths)
    np.testing.assert_array_equal(got, want)
