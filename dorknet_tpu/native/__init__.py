from dorknet_tpu.native.loader import (
    native_loader_available,
    decode_batch,
    decode_batch_hwc,
    build_native,
    AsyncDecodePool,
)

__all__ = ["native_loader_available", "decode_batch", "decode_batch_hwc",
           "build_native", "AsyncDecodePool"]
