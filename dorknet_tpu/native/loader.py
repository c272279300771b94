"""ctypes bindings for the native C++ batch image loader (native/dorknet_loader.cpp).

The native library does JPEG/PNG decode + bilinear resize + crop + CHW float32
normalisation batch-parallel over OpenMP threads — the host-side runtime the
reference implemented as Python ThreadPool + cv2 (reference:
data_loading/image_data_loader.py:97-98, image_preprocessor.py). Falls back
cleanly when the .so hasn't been built (``make -C native``); ImageDataLoader
uses it automatically when available (use_native_loader=True)."""

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libdorknet_loader.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.dorknet_decode_batch.restype = ctypes.c_int
    lib.dorknet_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_uint64]
    lib.dorknet_decode_batch_hwc.restype = ctypes.c_int
    lib.dorknet_decode_batch_hwc.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.dk_pool_create.restype = ctypes.c_void_p
    lib.dk_pool_create.argtypes = [ctypes.c_int]
    lib.dk_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.dk_pool_submit.restype = ctypes.c_int
    lib.dk_pool_submit.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_uint64]
    lib.dk_pool_poll.restype = ctypes.c_int
    lib.dk_pool_poll.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_int)]
    # v2 (fast_scale) entry points — absent in a stale pre-v2 .so, in which
    # case fast_scale requests raise with a rebuild hint instead of calling
    # a mismatched signature
    lib._has_v2 = hasattr(lib, "dorknet_decode_batch2")
    if lib._has_v2:
        lib.dorknet_decode_batch2.restype = ctypes.c_int
        lib.dorknet_decode_batch2.argtypes = \
            lib.dorknet_decode_batch.argtypes + [ctypes.c_int]
        lib.dorknet_decode_batch_hwc2.restype = ctypes.c_int
        lib.dorknet_decode_batch_hwc2.argtypes = \
            lib.dorknet_decode_batch_hwc.argtypes + [ctypes.c_int]
        lib.dk_pool_submit2.restype = ctypes.c_int
        lib.dk_pool_submit2.argtypes = \
            lib.dk_pool_submit.argtypes + [ctypes.c_int]
    _lib = lib
    return lib


def _require_v2(lib, what):
    if not getattr(lib, "_has_v2", False):
        raise RuntimeError(
            what + " needs the v2 native loader (fast_scale) — rebuild with "
            "make -C native or dorknet_tpu.native.build_native()")


def build_native():
    """Compile the native loader (g++ -O3 -fopenmp, links libjpeg/libpng)."""
    subprocess.run(["make", "-C", os.path.join(_REPO_ROOT, "native")], check=True)
    global _lib
    _lib = None
    return _load() is not None


def native_loader_available():
    return _load() is not None


def _path_array(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def decode_batch(paths, precrop_hw, crop_hw, crop_mode="center",
                 num_threads=None, seed=0, fast_scale=False):
    """Decode+preprocess a batch natively → (N, 3, crop_h, crop_w) float32,
    BGR CHW, -128 shifted (the reference preprocessor's output format).
    crop_mode: "center" | "random" | "resize" (plain resize, no crop).

    fast_scale=True decodes JPEGs at the smallest libjpeg DCT scale (M/8)
    that still covers the precrop size, engaged only when M <= 4 (source
    >= ~2x the target, where the scaled IDCT measures 1.25-1.5x on
    decode+resize alone, ~1.15x through the whole per-image pipeline;
    nearer sizes keep the exact full decode — scaled IDCT is a wash or
    slower there). When engaged the output is NOT
    bit-identical to cv2's full-decode+bilinear (the default stays exact;
    PNGs are always full-decoded).

    Formats: JPEG and PNG only. Anything else (BMP/TIFF/WebP, CMYK JPEG)
    zero-fills that slot and is counted in ``n - ok`` — datasets with such
    files should use the cv2 path (use_native_loader=False)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built — run make -C native "
                           "or dorknet_tpu.native.build_native()")
    mode = {"center": 0, "random": 1, "resize": 2}[crop_mode]
    if mode != 2 and (crop_hw[0] > precrop_hw[0] or crop_hw[1] > precrop_hw[1]):
        raise ValueError(
            "crop {} larger than precrop {} — the crop window must fit the "
            "resized canvas".format(tuple(crop_hw), tuple(precrop_hw)))
    n = len(paths)
    # np.empty: the native side writes every element (zero-fills failures)
    out = np.empty((n, 3, crop_hw[0], crop_hw[1]), dtype=np.float32)
    threads = num_threads or min(16, os.cpu_count() or 1)
    if fast_scale:
        _require_v2(lib, "decode_batch(fast_scale=True)")
        ok = lib.dorknet_decode_batch2(
            _path_array(paths), n, precrop_hw[0], precrop_hw[1],
            crop_hw[0], crop_hw[1], mode,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads,
            ctypes.c_uint64(seed), 1)
    else:
        ok = lib.dorknet_decode_batch(
            _path_array(paths), n, precrop_hw[0], precrop_hw[1],
            crop_hw[0], crop_hw[1], mode,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads,
            ctypes.c_uint64(seed))
    return out, ok


def decode_batch_hwc(paths, precrop_hw, num_threads=None, fast_scale=False):
    """Decode+resize only → (N, precrop_h, precrop_w, 3) uint8 BGR, for the
    on-device augmentation path (crop/flip/HSV/rotate happen on the TPU)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built — run make -C native "
                           "or dorknet_tpu.native.build_native()")
    n = len(paths)
    out = np.empty((n, precrop_hw[0], precrop_hw[1], 3), dtype=np.uint8)
    threads = num_threads or min(16, os.cpu_count() or 1)
    if fast_scale:
        _require_v2(lib, "decode_batch_hwc(fast_scale=True)")
        ok = lib.dorknet_decode_batch_hwc2(
            _path_array(paths), n, precrop_hw[0], precrop_hw[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads, 1)
    else:
        ok = lib.dorknet_decode_batch_hwc(
            _path_array(paths), n, precrop_hw[0], precrop_hw[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    return out, ok


class AsyncDecodePool:
    """Native async decode runtime: submit batch jobs (paths -> preallocated
    (N,3,crop_h,crop_w) float32 buffer), poll/wait completion — decode runs on
    C++ std::threads with zero Python-side work in flight. Replaces the
    reference's Python producer thread + ThreadPool as the loader runtime.

        pool = AsyncDecodePool(threads=8)
        job = pool.submit(paths, (281, 281), (225, 225), "random", seed=1)
        ...                       # train on the previous batch meanwhile
        batch, ok = pool.wait(job)
    """

    def __init__(self, threads=None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader not built — run make -C native")
        self._lib = lib
        self._pool = lib.dk_pool_create(threads or min(16, os.cpu_count() or 1))
        self._jobs = {}
        self._done = {}  # job_id -> ok_count, set when native poll completes

    def submit(self, paths, precrop_hw, crop_hw, crop_mode="center", seed=0,
               fast_scale=False):
        mode = {"center": 0, "random": 1, "resize": 2}[crop_mode]
        if mode != 2 and (crop_hw[0] > precrop_hw[0]
                          or crop_hw[1] > precrop_hw[1]):
            raise ValueError(
                "crop {} larger than precrop {} — the crop window must fit "
                "the resized canvas".format(tuple(crop_hw), tuple(precrop_hw)))
        out = np.empty((len(paths), 3, crop_hw[0], crop_hw[1]),
                       dtype=np.float32)
        arr = _path_array(paths)
        if fast_scale:
            _require_v2(self._lib, "AsyncDecodePool.submit(fast_scale=True)")
            job_id = self._lib.dk_pool_submit2(
                self._pool, arr, len(paths), precrop_hw[0], precrop_hw[1],
                crop_hw[0], crop_hw[1], mode,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_uint64(seed), 1)
        else:
            job_id = self._lib.dk_pool_submit(
                self._pool, arr, len(paths), precrop_hw[0], precrop_hw[1],
                crop_hw[0], crop_hw[1], mode,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_uint64(seed))
        self._jobs[job_id] = out  # keep the buffer alive until collected
        self._done.pop(job_id, None)  # native ids are reused after release
        return job_id

    def poll(self, job_id):
        """(done, ok_count). Safe to call repeatedly: completion is cached
        Python-side (the native poll RELEASES the job on its first 'done',
        and its id is then reused by a later submit)."""
        if job_id in self._done:
            return True, self._done[job_id]
        if job_id not in self._jobs:
            raise KeyError("unknown job {}".format(job_id))
        ok = ctypes.c_int(0)
        done = self._lib.dk_pool_poll(self._pool, job_id, ctypes.byref(ok))
        if done < 0:
            raise KeyError("unknown job {}".format(job_id))
        if done:
            self._done[job_id] = ok.value
            return True, ok.value
        return False, ok.value

    def wait(self, job_id, timeout_s=60.0, poll_interval_s=0.001):
        import time

        deadline = time.monotonic() + timeout_s
        while True:
            done, ok = self.poll(job_id)
            if done:
                self._done.pop(job_id, None)
                return self._jobs.pop(job_id), ok
            if time.monotonic() > deadline:
                raise TimeoutError("decode job {} timed out".format(job_id))
            time.sleep(poll_interval_s)

    def close(self):
        if self._pool is not None:
            self._lib.dk_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
