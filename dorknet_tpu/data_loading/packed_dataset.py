"""Packed pre-decoded dataset: decode once, train many.

The reference's input pipeline re-decodes JPEGs every epoch, so its
throughput ceiling is the host's decode rate (reference
data_loading/image_data_loader.py:88-117 — the loader exists to keep the
device fed). On a TPU that trains >10k img/s, per-epoch JPEG decode on a
small host is a 25x bottleneck (PERF.md, BENCH_r03 e2e vs device). The
TPU-native answer is a one-time pack: decode + precrop-resize every image
ONCE into an mmap-able uint8 array, then stream batches as pure page-cache
row gathers (~65-240 KB/image -> a few hundred MB/s of memory bandwidth
feeds 10k img/s; no decode on the training path at all).

Format (a directory):

* ``images.npy``  — (N, precrop_h, precrop_w, 3) uint8 BGR, the exact
  output of ``cv2.resize(cv2.imread(path), precrop_size)`` — i.e. the
  canvas the cv2 loader path produces before cropping, so downstream
  crop/augment/layout (and the on-device augmentation pipeline) see
  bit-identical inputs to the JPEG path. Written with
  ``np.lib.format.open_memmap`` so packing never holds the dataset in RAM,
  and read back with ``np.load(mmap_mode="r")``.
* ``labels.npy``  — (N,) int32 labels (sorted-class-name order, the same
  contract as ``discover_dataset``).
* ``packed_meta.json`` — format tag, precrop size, class names, and the
  source path of every row (pack order = ``discover_dataset`` order:
  classes sorted by name, paths sorted within a class), so a packed loader
  draws the SAME sample sequence as a JPEG-tree loader under the same seed.

``ImageDataLoader`` auto-detects a packed directory (the meta file) and
swaps its per-image decode for row gathers, keeping the full sampling
protocol: shuffle, class balance, mixup, and ``data_shard`` striding.
"""

import json
import os

import numpy as np

from dorknet_tpu.data_loading.image_data_loader import discover_dataset

PACKED_META = "packed_meta.json"
PACKED_FORMAT = "dorknet-packed-v1"


def is_packed_dir(path):
    """True if ``path`` is a packed-dataset directory."""
    return os.path.isdir(path) and os.path.isfile(
        os.path.join(path, PACKED_META))


def write_packed_dataset(base_folder, out_dir, precrop_size,
                         num_workers=1, use_native_loader=False,
                         fast_jpeg_scale=False, batch=256, log=None):
    """Decode every image under ``base_folder`` (the ``<class>/images/*``
    reference layout) once, resize to ``precrop_size`` ((h, w)), and write
    the packed directory. Returns the number of images packed.

    The default decode path is cv2 (bit-identical to the loader's cv2
    canvas); ``use_native_loader=True`` packs with the C++ decoder instead
    (faster; ``fast_jpeg_scale`` engages scaled-IDCT decode — both trade
    exact cv2 parity for pack speed, which only matters if you need packed
    batches bit-equal to a live-JPEG loader's)."""
    ph, pw = int(precrop_size[0]), int(precrop_size[1])
    label_map, per_class_paths, samples = discover_dataset(base_folder)
    if not samples:
        raise ValueError("no images found under {}".format(base_folder))
    os.makedirs(out_dir, exist_ok=True)
    n = len(samples)
    images = np.lib.format.open_memmap(
        os.path.join(out_dir, "images.npy"), mode="w+",
        dtype=np.uint8, shape=(n, ph, pw, 3))
    labels = np.empty((n,), np.int32)

    decode_native = None
    if use_native_loader:
        from dorknet_tpu.native import decode_batch_hwc, native_loader_available

        if native_loader_available():
            decode_native = decode_batch_hwc
        elif log:
            log("native loader not built — packing with cv2")

    if decode_native is None:
        import cv2
        from multiprocessing.pool import ThreadPool

        def _decode_chunk(paths):
            def one(p):
                im = cv2.imread(p)
                if im is None:
                    raise ValueError("failed to decode {}".format(p))
                # cv2.resize takes (width, height)
                return cv2.resize(im, (pw, ph))
            with ThreadPool(max(1, int(num_workers))) as pool:
                return np.stack(pool.map(one, paths), axis=0)
    else:
        def _decode_chunk(paths):
            out, ok = decode_native(paths, (ph, pw),
                                    max(1, int(num_workers)),
                                    fast_scale=fast_jpeg_scale)
            if ok < len(paths):
                raise ValueError("{} of {} images failed to decode".format(
                    len(paths) - ok, len(paths)))
            return out

    for start in range(0, n, batch):
        chunk = samples[start:start + batch]
        images[start:start + len(chunk)] = _decode_chunk(
            [p for _, p in chunk])
        labels[start:start + len(chunk)] = [label_map[c] for c, _ in chunk]
        if log:
            log("packed {}/{} images".format(
                min(start + len(chunk), n), n))
    images.flush()
    del images
    np.save(os.path.join(out_dir, "labels.npy"), labels)
    meta = {
        "format": PACKED_FORMAT,
        "precrop": [ph, pw],
        "class_names": list(label_map),
        "paths": [p for _, p in samples],
        "source": os.path.abspath(base_folder),
    }
    with open(os.path.join(out_dir, PACKED_META), "w") as f:
        json.dump(meta, f)
    return n


class PackedDataset:
    """Read side of a packed directory: mmap'd image rows + labels + the
    class/path index the loader samples from. Row gathers go through the
    OS page cache — a warm epoch never touches the decoder or the disk."""

    def __init__(self, path):
        with open(os.path.join(path, PACKED_META)) as f:
            meta = json.load(f)
        if meta.get("format") != PACKED_FORMAT:
            raise ValueError("{} is not a {} directory (format={!r})".format(
                path, PACKED_FORMAT, meta.get("format")))
        self.path = path
        self.precrop = tuple(meta["precrop"])  # (h, w)
        self.class_names = list(meta["class_names"])
        self.paths = list(meta["paths"])
        self.labels = np.load(os.path.join(path, "labels.npy"))
        self.images = np.load(os.path.join(path, "images.npy"),
                              mmap_mode="r")
        n = len(self.paths)
        if not (self.images.shape[0] == n == self.labels.shape[0]):
            raise ValueError(
                "packed dataset {} is inconsistent: {} paths, {} rows, "
                "{} labels".format(path, n, self.images.shape[0],
                                   self.labels.shape[0]))
        # per-class row lists in pack order (= sorted-path order within the
        # sorted-name classes), the same sequence discover_dataset yields —
        # a packed loader and a JPEG-tree loader draw identical samples
        # under the same RNG seed.
        self.per_class_rows = {name: [] for name in self.class_names}
        for row, label in enumerate(self.labels):
            self.per_class_rows[self.class_names[int(label)]].append(row)

    def __len__(self):
        return len(self.paths)

    def gather(self, rows):
        """(B,) row indices -> (B, ph, pw, 3) uint8 batch (a real copy —
        safe to mutate / ship to the device)."""
        return self.images[np.asarray(rows, dtype=np.int64)]
