"""HBM-resident dataset: upload the packed dataset to the device ONCE,
then train with zero per-step image traffic.

The reference keeps the device fed with a host producer thread that
re-gathers and ships every batch (reference
data_loading/image_data_loader.py:88-117). On a TPU, once a packed dataset
(packed_dataset.py) fits in HBM, the idiomatic design inverts: the dataset
is device-resident, the host's entire per-step contribution is a (B,) int32
index vector (~4 bytes/image instead of ~240 KB/image at 281px), and
gather -> one-hot -> augment -> train fuse into ONE dispatched program
(Trainer.step_augmented_indexed). The sampling PROTOCOL — shuffle, class
balance, ``data_shard`` striding, reference-identical draw sequence under a
seed — stays host-side, delegated to a thread-less ``ImageDataLoader`` so
this loader and the streaming loaders draw the same rows.

Sizing: a 120-class dogs-scale dataset at 281px uint8 is ~237 KB/image, so
~16 GB of HBM holds ~70k images minus model/optimiser state; bigger
datasets stay on the streaming packed path (``ImageDataLoader`` over a
packed dir). ``fits_in_hbm`` is the advisory check.
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from dorknet_tpu.data_loading.image_data_loader import ImageDataLoader
from dorknet_tpu.data_loading.image_preprocessor import ImagePreprocessor
from dorknet_tpu.data_loading.packed_dataset import PACKED_META

# Per-chunk upload bound: a single bulk device_put of the whole dataset can
# stall for tens of minutes through a degraded link (CLAUDE.md), and each
# chunk is synced (np round-trip is the only true sync on axon) so progress
# is observable and a dead link fails fast instead of hanging the process.
_DEFAULT_CHUNK_BYTES = 64 << 20


def fits_in_hbm(packed, budget_bytes=8 << 30):
    """Advisory: True when ``packed``'s image array fits ``budget_bytes``
    (default 8 GB — half of a v5e chip's HBM, leaving the rest for model,
    optimiser state, and the training program's working set)."""
    return packed.images.nbytes <= budget_bytes


class DeviceResidentDataset:
    """A packed dataset uploaded to device memory once, plus the host-side
    index sampler that drives ``Trainer.step_augmented_indexed``.

    ``images``: (N, ph, pw, 3) uint8 device array; ``labels``: (N,) int32
    device array; ``pull_indices(k)`` yields k (B,) int32 row-index batches
    drawn with the SAME protocol (and, under the same RNG seed, the same
    sequence) as an ``ImageDataLoader`` over the packed directory —
    the sampler IS an ``ImageDataLoader`` constructed with
    ``start_thread=False``, so shuffle / class balance / data_shard
    semantics are inherited, not re-implemented.
    """

    def __init__(self, packed_path, batch_size, class_balance=True,
                 data_shard=None, sharding=None,
                 chunk_bytes=_DEFAULT_CHUNK_BYTES, expect_precrop=None,
                 log=None):
        # meta-only peek for the precrop (cheap; the mmap + row map are
        # opened ONCE, by the sampler below, and reused from it)
        with open(os.path.join(packed_path, PACKED_META)) as f:
            ph, pw = json.load(f)["precrop"]
        if expect_precrop is not None and tuple(expect_precrop) != (ph, pw):
            raise ValueError(
                "packed dataset {} holds {}-pixel canvases but "
                "expect_precrop={} — repack with scripts/pack_dataset.py "
                "(a stale pack from a different image size trains with "
                "wrong crop geometry)".format(
                    packed_path, (ph, pw), tuple(expect_precrop)))
        # thread-less sampler: reuses the full sampling protocol; the
        # preprocessor exists only to satisfy the precrop-consistency check
        # (out size is irrelevant — this loader never decodes or crops)
        self._sampler = ImageDataLoader(
            packed_path, batch_size=batch_size,
            preprocessor=ImagePreprocessor((ph, pw),
                                           precrop_size=(pw, ph)),
            class_balance=class_balance, data_shard=data_shard,
            emit_hwc_uint8=True, start_thread=False)
        self.packed = self._sampler.packed
        self._row_of = self._sampler._packed_row
        self.batch_size = int(batch_size)
        self.num_classes = len(self.packed.class_names)
        self.class_names = list(self.packed.class_names)

        src_img, src_lbl = self.packed.images, self.packed.labels
        rows_per_chunk = max(1, int(chunk_bytes) // max(
            1, src_img[0].nbytes if len(src_img) else 1))
        # Preallocate the full device buffer and fill it per chunk with a
        # DONATED dynamic_update_slice: peak HBM stays at dataset + one
        # chunk. (The obvious jnp.concatenate over all uploaded chunks
        # holds dataset + full copy — 2x — which OOMs exactly the
        # fits_in_hbm-sized datasets this class targets.)
        buf = jax.jit(lambda: jnp.zeros(src_img.shape, src_img.dtype),
                      out_shardings=sharding)()
        update = jax.jit(
            lambda b, c, s: jax.lax.dynamic_update_slice_in_dim(
                b, c, s, axis=0),
            donate_argnums=(0,))
        for start in range(0, len(src_img), rows_per_chunk):
            c = jax.device_put(np.ascontiguousarray(
                src_img[start:start + rows_per_chunk]), sharding)
            buf = update(buf, c, start)
            # true sync per chunk (block_until_ready is unreliable on axon)
            np.asarray(buf[start, 0, 0])
            if log:
                log("device dataset: uploaded {}/{} rows".format(
                    min(start + rows_per_chunk, len(src_img)),
                    len(src_img)))
        self.images = buf
        self.labels = jax.device_put(
            np.ascontiguousarray(src_lbl, dtype=np.int32), sharding)
        np.asarray(self.labels[0])

    def __len__(self):
        return len(self.packed)

    def next_indices(self):
        """One (B,) int32 row-index draw (same sequence as the streaming
        loader's get_batch_list under the same RNG state)."""
        paths, _ = self._sampler.get_batch_list(self._sampler.class_balance)
        return np.fromiter((self._row_of[p] for p in paths),
                           dtype=np.int32, count=len(paths))

    def pull_indices(self, num_steps):
        for _ in range(int(num_steps)):
            yield self.next_indices()

    def shuffle_indices(self):
        """Reshuffle the flat index cycle (reference epoch protocol)."""
        self._sampler.shuffle_indices()
