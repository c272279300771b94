"""Pack a ``<class>/images/*`` JPEG tree into a pre-decoded dataset.

Decode-once, train-many: the training path then streams mmap'd uint8 rows
instead of re-decoding JPEGs every epoch (data_loading/packed_dataset.py).
The packed canvas is the cv2 precrop canvas, so a packed loader's batches
are bit-identical to the live-JPEG loader's under the same seed (pinned by
tests/test_packed_dataset.py).

Usage:
    python -m scripts.pack_dataset SRC_TREE OUT_DIR \
        [--image-size 225] [--precrop H W] [--workers N] \
        [--native] [--fast-jpeg-scale] [--batch 256]

``--image-size`` derives the reference's 1.25x precrop; ``--precrop``
overrides it directly (rows cols).
"""

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("src", help="<class>/images/* source tree")
    ap.add_argument("out", help="output packed directory")
    ap.add_argument("--image-size", type=int, default=225,
                    help="square training size; precrop = 1.25x this")
    ap.add_argument("--precrop", type=int, nargs=2, metavar=("H", "W"),
                    help="explicit precrop canvas (rows cols); overrides "
                         "--image-size")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--native", action="store_true",
                    help="decode with the C++ loader (faster; not "
                         "bit-identical to cv2)")
    ap.add_argument("--fast-jpeg-scale", action="store_true",
                    help="native only: scaled-IDCT decode for large sources")
    ap.add_argument("--batch", type=int, default=256,
                    help="images decoded per write chunk")
    args = ap.parse_args(argv)

    from dorknet_tpu.data_loading.image_preprocessor import default_precrop
    from dorknet_tpu.data_loading.packed_dataset import write_packed_dataset

    if args.precrop:
        precrop = tuple(args.precrop)
    else:
        # default_precrop returns the cv2 (width, height) order the
        # preprocessor carries; the packer wants (rows, cols)
        w, h = default_precrop((args.image_size, args.image_size))
        precrop = (h, w)

    t0 = time.perf_counter()
    n = write_packed_dataset(
        args.src, args.out, precrop, num_workers=args.workers,
        use_native_loader=args.native, fast_jpeg_scale=args.fast_jpeg_scale,
        batch=args.batch, log=lambda m: print(m, file=sys.stderr))
    dt = time.perf_counter() - t0
    print("packed {} images -> {} in {:.1f}s ({:.0f} img/s)".format(
        n, args.out, dt, n / max(dt, 1e-9)))


if __name__ == "__main__":
    main()
