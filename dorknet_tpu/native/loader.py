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
    _lib = lib
    return lib


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
                 num_threads=None, seed=0):
    """Decode+preprocess a batch natively → (N, 3, crop_h, crop_w) float32,
    BGR CHW, -128 shifted (the reference preprocessor's output format).
    crop_mode: "center" | "random" | "resize" (plain resize, no crop)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built — run make -C native "
                           "or dorknet_tpu.native.build_native()")
    mode = {"center": 0, "random": 1, "resize": 2}[crop_mode]
    n = len(paths)
    out = np.zeros((n, 3, crop_hw[0], crop_hw[1]), dtype=np.float32)
    threads = num_threads or min(16, os.cpu_count() or 1)
    ok = lib.dorknet_decode_batch(
        _path_array(paths), n, precrop_hw[0], precrop_hw[1],
        crop_hw[0], crop_hw[1], mode,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads,
        ctypes.c_uint64(seed))
    return out, ok


def decode_batch_hwc(paths, precrop_hw, num_threads=None):
    """Decode+resize only → (N, precrop_h, precrop_w, 3) uint8 BGR, for the
    on-device augmentation path (crop/flip/HSV/rotate happen on the TPU)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built — run make -C native "
                           "or dorknet_tpu.native.build_native()")
    n = len(paths)
    out = np.zeros((n, precrop_hw[0], precrop_hw[1], 3), dtype=np.uint8)
    threads = num_threads or min(16, os.cpu_count() or 1)
    ok = lib.dorknet_decode_batch_hwc(
        _path_array(paths), n, precrop_hw[0], precrop_hw[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    return out, ok
