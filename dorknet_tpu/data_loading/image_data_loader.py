"""Threaded image-directory loader.

Behavioural parity with the reference ImageDataLoader
(data_loading/image_data_loader.py:9-122):

* class discovery from ``base_folder/<class>/images/*`` directory structure,
  class→index map in sorted-name order;
* a background producer thread fills a bounded queue (maxsize 5) with
  (X (B,C,H,W) float32, y_list, one_hot) batches; per-image decode fans out on a
  ThreadPool of ``num_workers``;
* sampling: class-balanced round-robin over per-class path cycles OR a flat
  index cycle over all samples;
* mixup: when ``mixup_range_tuple`` is set, each draw produces TWO batches —
  the convex combinations lam*B2+(1-lam)*B1 and lam*B1+(1-lam)*B2 with matching
  soft labels (reference :100-112);
* the pause → drain → reshuffle → restart protocol of ``shuffle_indices``
  (reference :52-69) and graceful ``stop_thread``.

The thread coordination is re-implemented with Events (the reference's
hand-rolled message-queue protocol is race-prone, SURVEY §5) but the observable
behaviour — including pulling queued batches to unblock the producer — is the
same. Consumption pairs with ``data_loading.device_prefetch`` to overlap the
host→device copy with compute.
"""

import itertools
import os
import queue
import sys
import threading
from multiprocessing.pool import ThreadPool

import numpy as np


def num_workers_hint(n):
    return max(1, int(n))


def discover_dataset(base_folder):
    """Scan the ``base_folder/<class>/images/*`` reference directory layout
    once. Returns (label_map, per_class_paths, samples):

    * ``label_map``: class name → integer label, assigned in sorted-name
      order (the contract scripts/make_class_name_map.py relies on);
    * ``per_class_paths``: class name → list of image paths (sorted, so
      sampling order is reproducible across filesystems);
    * ``samples``: flat [(class name, path), ...] over every image.
    """
    names = sorted(d for d in os.listdir(base_folder)
                   if os.path.isdir(os.path.join(base_folder, d)))
    label_map = {name: label for label, name in enumerate(names)}
    per_class_paths = {}
    for name in names:
        images_dir = os.path.join(base_folder, name, "images")
        per_class_paths[name] = [os.path.join(images_dir, f)
                                 for f in sorted(os.listdir(images_dir))]
    samples = [(name, path) for name in names for path in per_class_paths[name]]
    return label_map, per_class_paths, samples


def mixup_pair(X_a, y_a, X_b, y_b, lam):
    """The reference's mixup emits BOTH convex orderings of a batch pair per
    draw (ref image_data_loader.py:100-112): returns
    ``[(lam*Xb + (1-lam)*Xa, matching soft labels), (the mirror image)]``."""
    blend = lambda u, v: (lam * u + (1 - lam) * v).astype(np.float32)  # noqa: E731
    return [(blend(X_b, X_a), blend(y_b, y_a)),
            (blend(X_a, X_b), blend(y_a, y_b))]


class ImageDataLoader:
    def __init__(self, base_folder, batch_size, preprocessor,
                 classes_from_dir_structure=True, num_workers=1,
                 class_balance=True, mixup_range_tuple=None,
                 start_thread=True, use_native_loader=False,
                 emit_hwc_uint8=False, data_shard=None,
                 fast_jpeg_scale=False):
        """emit_hwc_uint8=True is the on-device-augmentation mode: the host
        only decodes + resizes to the preprocessor's precrop size and emits
        (B, precrop_h, precrop_w, 3) uint8 BGR batches; crop / flip / HSV /
        rotation / mixup then run as ONE jitted program on the accelerator
        (data_loading/device_augment.py:train_pipeline). mixup_range_tuple is
        ignored in this mode (mixup moves on device too).

        data_shard=(process_index, process_count) restricts this loader to a
        deterministic 1/process_count shard of every class's (sorted) file
        list — the multi-host recipe (parallel/multihost.py): each host
        constructs its loader with its own process index, feeds its local
        rows, and the shards are disjoint with union = the full dataset.
        Labels are assigned from the FULL directory listing, so class ids
        agree across hosts regardless of which files a shard holds.

        fast_jpeg_scale=True (native loader only) decodes JPEGs at the
        smallest libjpeg DCT scale covering the precrop size, engaged only
        for sources >= ~2x the target (measured 1.25-1.5x on decode+resize
        alone, ~1.15x through the whole per-image pipeline; nearer sizes
        keep the exact full decode). Engaged
        decodes are not bit-identical to cv2's full-decode+bilinear. Use
        when the host decode rate is the input-pipeline ceiling
        (bench_e2e_train's decoded-img/s) and exact cv2 parity is not
        required."""
        self.keep_loading = True
        self.preprocessor = preprocessor
        self.emit_hwc_uint8 = emit_hwc_uint8
        if emit_hwc_uint8:
            mixup_range_tuple = None
        # Native C++ decode path (native/dorknet_loader.cpp): OpenMP-parallel
        # JPEG/PNG decode+resize+crop, usable when the preprocessor carries no
        # augmenter (host augmentation needs the cv2 path; on-device
        # augmentation pairs with decode_batch_hwc instead).
        self.use_native_loader = False
        self.fast_jpeg_scale = bool(fast_jpeg_scale)
        if use_native_loader:
            from dorknet_tpu.native import native_loader_available

            if (native_loader_available()
                    and getattr(preprocessor, "image_augmenter", None) is None
                    and getattr(preprocessor, "crop_mode", None) in (
                        "center", "random", None)):
                self.use_native_loader = True
            else:
                print("ImageDataLoader: native loader unavailable or "
                      "incompatible preprocessor — falling back to cv2 path",
                      file=sys.stderr)
        self.mixup_range_tuple = mixup_range_tuple
        self.base_folder = base_folder
        self.num_workers = num_workers
        self.batch_size = batch_size
        self.batch_queue = queue.Queue(maxsize=5)
        self.class_balance = class_balance
        # pause/resume handshake state, all guarded by _cond (a bare flag pair
        # raced: a producer waking from pause could clobber a second pause
        # request and leave shuffle_indices waiting forever)
        self._cond = threading.Condition()
        self._pause_requests = 0
        self._producer_paused = False
        self._lock = threading.Lock()

        if not classes_from_dir_structure:
            # the reference accepts False and then dies in its producer thread
            # on the missing attributes (ref image_data_loader.py:26-44 sets
            # the sampling state only under the flag) — fail loudly instead
            raise ValueError(
                "classes_from_dir_structure=False is not supported: the "
                "loader's sampling state comes from the <class>/images/* "
                "directory layout (the reference silently hangs here)")
        # Packed pre-decoded mode (data_loading/packed_dataset.py): when
        # base_folder is a packed directory, per-image JPEG decode is replaced
        # by mmap row gathers; sampling still walks the ORIGINAL source paths
        # (recorded in the pack), so shuffle / class balance / mixup /
        # data_shard draw the same sequence as a live-JPEG loader would.
        from dorknet_tpu.data_loading.packed_dataset import (
            PackedDataset, is_packed_dir)

        self.packed = None
        self._packed_row = None
        if is_packed_dir(base_folder):
            self.packed = PackedDataset(base_folder)
            self._packed_row = {p: i for i, p in enumerate(self.packed.paths)}
            self.class_name_num_map = {
                name: label for label, name in
                enumerate(self.packed.class_names)}
            per_class_paths = {
                name: [self.packed.paths[r] for r in rows]
                for name, rows in self.packed.per_class_rows.items()}
            self.samples = [(name, path) for name in self.packed.class_names
                            for path in per_class_paths[name]]
            self.use_native_loader = False  # nothing left to decode
            pp = self.preprocessor
            want = (pp.precrop_size[1], pp.precrop_size[0])  # (rows, cols)
            if tuple(self.packed.precrop) != want:
                raise ValueError(
                    "packed dataset {} holds {}-pixel canvases but the "
                    "preprocessor wants precrop {} — repack with "
                    "scripts/pack_dataset.py".format(
                        base_folder, self.packed.precrop, want))
            from dorknet_tpu.data_loading.device_dataset import fits_in_hbm

            # advisory only for a real streaming loader: sampler-only
            # constructions (start_thread=False — notably the one INSIDE
            # DeviceResidentDataset) must not recommend the path they are
            # already part of
            if start_thread and fits_in_hbm(self.packed):
                # advisory only: the resident path measured 89-91% of the
                # train-only ceiling vs per-step batch uploads (PERF.md r5)
                print("ImageDataLoader: packed dataset fits in HBM "
                      "({:.0f} MB) — DeviceResidentDataset + "
                      "Trainer.step_augmented_indexed avoids per-step "
                      "image uploads entirely".format(
                          self.packed.images.nbytes / 1e6),
                      file=sys.stderr)
        else:
            self.class_name_num_map, per_class_paths, self.samples = (
                discover_dataset(base_folder))
        self.class_names = list(self.class_name_num_map)
        if data_shard is not None:
            shard_idx, shard_count = data_shard
            if not (isinstance(shard_idx, int) and isinstance(shard_count, int)
                    and shard_count >= 1 and 0 <= shard_idx < shard_count):
                raise ValueError(
                    "data_shard must be (process_index, process_count) with "
                    "0 <= index < count, got {!r}".format(data_shard))
            # per-class striding keeps every shard class-balanced (to within
            # one image) and the shards disjoint with union = full dataset;
            # sorted file lists make the split deterministic across hosts
            per_class_paths = {n: p[shard_idx::shard_count]
                               for n, p in per_class_paths.items()}
            self.samples = [(n, path) for n in self.class_names
                            for path in per_class_paths[n]]
        # Fail at construction, not in the producer: an empty dataset (or, in
        # class-balanced mode, any empty class) would make the producer's
        # cycle raise StopIteration forever — an unbounded retry loop spamming
        # stderr while pull_batch blocks on an empty queue.
        shard_note = ("" if data_shard is None else
                      " (after data_shard={} striding)".format(data_shard))
        if not self.samples:
            raise ValueError(
                "no images found under {} (expected <class>/images/* "
                "layout){}".format(base_folder, shard_note))
        if class_balance:
            empty = [n for n, p in per_class_paths.items() if not p]
            if empty:
                raise ValueError(
                    "class_balance=True but these classes have no images{}: "
                    "{}".format(shard_note, empty))
        # class-balanced mode: round-robin over classes, cycling each
        # class's own path list independently
        self.class_cycle = itertools.cycle(
            (name, itertools.cycle(paths))
            for name, paths in per_class_paths.items())
        # flat mode: an index cycle over all samples (reshuffled by
        # shuffle_indices)
        self.index_cycle = itertools.cycle(range(len(self.samples)))
        # the reference prints this to stdout (image_data_loader.py:38);
        # stderr here so programmatic stdout (bench.py's JSON line,
        # piped example output) stays clean
        print("Number of samples: ", len(self.samples), file=sys.stderr)

        self.queue_thread = threading.Thread(target=self.load_batch,
                                             args=(self.class_balance,),
                                             daemon=True)
        if start_thread:
            self.queue_thread.start()

    # ------------------------------------------------------------------ #
    def stop_thread(self):
        self.keep_loading = False
        with self._cond:
            self._cond.notify_all()  # unblock a paused producer
        # Drain so a producer blocked on put() can exit.
        try:
            while True:
                self.batch_queue.get_nowait()
        except queue.Empty:
            pass
        if self.queue_thread.is_alive():
            self.queue_thread.join(timeout=10)

    def shuffle_indices(self):
        """Pause the producer, drain queued (stale-order) batches, reshuffle the
        flat index cycle, restart (reference :52-69)."""
        with self._cond:
            self._pause_requests += 1
            self._cond.notify_all()
        try:
            # wake a producer blocked on put() and wait for the pause ack
            while True:
                with self._cond:
                    if self._producer_paused or not self.queue_thread.is_alive():
                        break
                try:
                    self.batch_queue.get(timeout=0.1)
                except queue.Empty:
                    pass
            try:
                while True:
                    self.batch_queue.get_nowait()
            except queue.Empty:
                pass
            with self._lock:
                self.index_cycle = itertools.cycle(
                    list(np.random.permutation(len(self.samples))))
        finally:
            with self._cond:
                self._pause_requests -= 1
                self._cond.notify_all()

    # ------------------------------------------------------------------ #
    def get_batch_list(self, class_balance=True):
        """One (paths, labels) draw under the sampling lock."""
        X_batch_list, y_batch_list = [], []
        with self._lock:
            if class_balance:
                for _ in range(self.batch_size):
                    c_name, path_cycle = next(self.class_cycle)
                    y_batch_list.append(self.class_name_num_map[c_name])
                    X_batch_list.append(next(path_cycle))
            else:
                for _ in range(self.batch_size):
                    c_name, path = self.samples[next(self.index_cycle)]
                    y_batch_list.append(self.class_name_num_map[c_name])
                    X_batch_list.append(path)
        return X_batch_list, y_batch_list

    def _decode_batch(self, pool, X_batch_list):
        if self.packed is not None:
            canvases = self.packed.gather(
                [self._packed_row[p] for p in X_batch_list])
            if self.emit_hwc_uint8:
                return canvases
            from dorknet_tpu.data_loading.image_preprocessor import (
                preprocess_canvas)

            pp = self.preprocessor

            def prep(im):
                return preprocess_canvas(
                    im, pp.image_size, pp.crop_mode, pp.image_augmenter,
                    pp.apply_augmenter)

            return np.stack(pool.map(prep, canvases), axis=0)
        if self.emit_hwc_uint8:
            pp = self.preprocessor
            precrop = (pp.precrop_size[1], pp.precrop_size[0])
            if self.use_native_loader:
                from dorknet_tpu.native import decode_batch_hwc

                out, ok = decode_batch_hwc(X_batch_list, precrop,
                                           num_workers_hint(self.num_workers),
                                           fast_scale=self.fast_jpeg_scale)
                if ok < len(X_batch_list):
                    print("ImageDataLoader: {} of {} images failed to decode "
                          "(zero-filled)".format(len(X_batch_list) - ok,
                                                 len(X_batch_list)),
                          file=sys.stderr)
                return out
            import cv2

            def load(p):
                # zero-fill unreadable images like the native path does —
                # one corrupt file must not kill the producer thread
                try:
                    im = cv2.imread(p)
                    if im is None:
                        raise ValueError("imread returned None")
                    return cv2.resize(im, pp.precrop_size)
                except Exception as e:  # noqa: BLE001
                    print("ImageDataLoader: failed to decode {} ({}); "
                          "zero-filled".format(p, e), file=sys.stderr)
                    return np.zeros((pp.precrop_size[1], pp.precrop_size[0],
                                     3), np.uint8)

            return np.stack(pool.map(load, X_batch_list), axis=0)
        if self.use_native_loader:
            from dorknet_tpu.native import decode_batch

            pp = self.preprocessor
            # native decode_batch takes (rows, cols); the cv2 path crops
            # image_size[0] ROWS x image_size[1] cols (reference indexing,
            # image_preprocessor.crop_origin) — pass the same axis order so
            # both decode paths agree for non-square sizes
            crop = (pp.image_size[0], pp.image_size[1])
            precrop = (pp.precrop_size[1], pp.precrop_size[0])
            mode = pp.crop_mode if pp.crop_mode in ("center", "random") else "resize"
            out, ok = decode_batch(X_batch_list, precrop, crop, mode,
                                   num_workers_hint(self.num_workers),
                                   seed=np.random.randint(0, 2 ** 31),
                                   fast_scale=self.fast_jpeg_scale)
            if ok < len(X_batch_list):
                print("ImageDataLoader: {} of {} images failed to decode "
                      "(zero-filled)".format(len(X_batch_list) - ok,
                                             len(X_batch_list)),
                      file=sys.stderr)
            return out
        def load_preprocessed(p):
            try:
                return self.preprocessor.load_image(p)
            except Exception as e:  # noqa: BLE001 — zero-fill like the
                # native path; a corrupt file must not kill the producer
                print("ImageDataLoader: failed to decode {} ({}); "
                      "zero-filled".format(p, e), file=sys.stderr)
                pp = self.preprocessor
                return np.zeros((3, pp.image_size[0], pp.image_size[1]),
                                np.float32)

        return np.stack(pool.map(load_preprocessed, X_batch_list), axis=0)

    def load_batch(self, class_balance):
        eye = np.eye(len(self.class_names), dtype=np.float32)
        with ThreadPool(self.num_workers) as pool:
            while self.keep_loading:
                with self._cond:
                    if self._pause_requests:
                        self._producer_paused = True
                        self._cond.notify_all()
                        while self._pause_requests and self.keep_loading:
                            self._cond.wait(timeout=0.25)
                        self._producer_paused = False
                        continue
                try:
                    X_batch_list, y_batch_list = self.get_batch_list(
                        class_balance=class_balance)
                    X_batch = self._decode_batch(pool, X_batch_list)
                    one_hot_y = eye[np.asarray(y_batch_list)]
                    if self.mixup_range_tuple is not None:
                        # draw a partner batch and emit both convex orderings
                        X_list_m, y_list_m = self.get_batch_list(
                            class_balance=class_balance)
                        X_batch_m = self._decode_batch(pool, X_list_m)
                        mixed = mixup_pair(
                            X_batch, one_hot_y, X_batch_m,
                            eye[np.asarray(y_list_m)],
                            np.random.uniform(*self.mixup_range_tuple))
                        for labels, (X_mixed, y_mixed) in zip(
                                (y_batch_list, y_list_m), mixed):
                            self._put((X_mixed, labels, y_mixed))
                    else:
                        self._put((X_batch, y_batch_list, one_hot_y))
                except Exception:  # noqa: BLE001 — a dead producer hangs
                    # every consumer on a silent queue; log and keep serving
                    import traceback

                    print("ImageDataLoader producer: batch failed, "
                          "continuing:\n" + traceback.format_exc(),
                          file=sys.stderr)

    def _put(self, item):
        while self.keep_loading:
            try:
                self.batch_queue.put(item, timeout=0.25)
                return
            except queue.Full:
                if self._pause_requests:
                    return  # stale-order batch; shuffle is draining anyway

    def pull_batch(self, num_steps):
        for _ in range(num_steps):
            yield self.batch_queue.get()
