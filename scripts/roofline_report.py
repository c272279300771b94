"""Per-layer training-step roofline report for any zoo model — no chip needed.

Prints utils.model_summary.roofline's table (per-layer MXU-vs-HBM bound,
speed-of-light step time) for a model, under both traffic schedules, plus
the headline MFU math for an optional measured step time. Pure shape
arithmetic on the host: use it to see whether a model change can pay BEFORE
burning a 20-40 s compile on the chip (calibration evidence: PERF.md
round-4 — the "xla" schedule predicted the measured ResNet-50 b128 bf16
step within 0.3%).

    python -m scripts.roofline_report --model resnet50 --batch 128 \
        --image 224 [--classes 1000] [--fp32] [--schedule xla|perfect] \
        [--measured-ms 44.1] [--json]

The reference has no cost-model tooling at all; its nearest analogue is
printing layer reprs (/root/reference/network/feed_forward_network.py:140).
"""

import argparse
import json


_MODELS = {
    "resnet18": ("ResNet18", 120, 225),
    "resnet18_plain": ("build_resnet18_plain", 120, 225),
    "resnet50": ("ResNet50", 1000, 224),
    "resnet101": ("ResNet101", 1000, 224),
    "mobilenet_v2": ("MobileNetV2", 1000, 224),
    "mobilenet_v3": ("MobileNetV3Small", 1000, 224),
    "efficientnet_lite0": ("EfficientNetLite0", 1000, 224),
    "mnist": ("MNISTNet", 10, 28),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="resnet18", choices=sorted(_MODELS))
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image", type=int, default=None,
                    help="square input size (default: the model's native)")
    ap.add_argument("--classes", type=int, default=None)
    ap.add_argument("--fp32", action="store_true",
                    help="cost fp32 activation flow (default bf16)")
    ap.add_argument("--schedule", default="xla", choices=("xla", "perfect"))
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--peak-gbs", type=float, default=820.0)
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="a measured device step time: report MFU and "
                         "roofline fraction against it")
    ap.add_argument("--json", action="store_true",
                    help="one JSON line instead of the table")
    args = ap.parse_args(argv)

    import jax

    # pure host arithmetic — never touch the (possibly tunneled) accelerator;
    # param-array creation would otherwise go through it
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import dorknet_tpu.models as zoo
    from dorknet_tpu.utils.model_summary import roofline

    cls_name, d_classes, d_image = _MODELS[args.model]
    classes = args.classes or d_classes
    image = args.image or d_image
    np.random.seed(0)
    if args.model == "mnist":
        net, chans = zoo.MNISTNet("roofline"), 1
    else:
        net, chans = getattr(zoo, cls_name)("roofline",
                                            num_classes=classes), 3
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16

    r = roofline(net, (args.batch, chans, image, image), compute_dtype=dtype,
                 peak_tflops=args.peak_tflops, peak_gbs=args.peak_gbs,
                 schedule=args.schedule, print_table=not args.json)

    out = {
        "model": args.model, "batch": args.batch, "image": image,
        "dtype": "float32" if args.fp32 else "bfloat16",
        "schedule": args.schedule,
        "sol_ms": round(r["sol_ms"], 3),
        "sol_img_per_s": round(args.batch / (r["sol_ms"] / 1e3), 1),
        "train_tflop_per_step": round(r["train_flops"] / 1e12, 4),
        "traffic_gb_per_step": round(r["traffic_bytes"] / 1e9, 3),
        "mxu_bound_frac": round(r["compute_bound_ms"] / max(r["sol_ms"],
                                                            1e-12), 3),
    }
    if args.measured_ms:
        m = args.measured_ms
        out["measured_ms"] = m
        out["mfu"] = round(r["train_flops"] / (m / 1e3)
                           / (args.peak_tflops * 1e12), 3)
        out["roofline_frac"] = round(r["sol_ms"] / m, 3)
    if args.json:
        print(json.dumps(out))
    else:
        print()
        for k, v in out.items():
            print("{:>22}: {}".format(k, v))
    return out


if __name__ == "__main__":
    main()
