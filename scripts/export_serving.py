"""Export a trained checkpoint to a self-contained serving artifact.

Bridges the reference deployment unit (json structure + h5 weights,
reference network/feed_forward_network.py:90-139) to the TPU-native one
(InferenceRunner.export_program: jax.export StableHLO with weights baked in
— loadable by any JAX process with NO dorknet_tpu code).

    python -m scripts.export_serving \
        --json net.json --h5 epoch_26_testacc_0.686.h5 \
        --out dogs_serving.shlo \
        --input 3,225,225 --batch 128 [--int8] [--no-fold-bn] \
        [--bf16] [--polymorphic] [--platforms tpu,cpu]

Verify at the destination with:

    from dorknet_tpu.network import load_serving_artifact  # or inline the
    art = load_serving_artifact("dogs_serving.shlo")        # loader — it is
    probs = art.predict_probs(images_nchw)                  # just
                                                            # jax.export.deserialize
"""

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--json", required=True, help="layer-structure json")
    ap.add_argument("--h5", required=True, help="weights h5")
    ap.add_argument("--out", required=True, help="artifact output path")
    ap.add_argument("--input", default="3,225,225",
                    help="per-image C,H,W (default: the dogs flagship)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--int8", action="store_true",
                    help="export the int8-quantised runner (dynamic "
                         "activation scales unless --scales is given)")
    ap.add_argument("--scales", default=None,
                    help="with --int8: calibrated activation scales — a "
                         "JSON list (inline, or a path to a .json file) as "
                         "recorded by QuantizedInferenceRunner.get_scales(); "
                         "baked via set_scales() so the artifact reproduces "
                         "a calibrated server exactly")
    ap.add_argument("--dw-weight-only", action="store_true",
                    help="with --int8: depthwise weights stored int8 but "
                         "computed in the flow dtype (the measured policy — "
                         "full int8 depthwise erases the serving win, "
                         "PERF.md round-4 A/B)")
    ap.add_argument("--no-fold-bn", action="store_true",
                    help="serve unfolded BN (default folds conv→BN pairs)")
    ap.add_argument("--bf16", action="store_true",
                    help="export under the bf16 activation-flow policy")
    ap.add_argument("--polymorphic", action="store_true",
                    help="symbolic batch dim: one artifact, any batch size")
    ap.add_argument("--platforms", default=None,
                    help="comma list, e.g. tpu,cpu (default: current "
                         "backend only)")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    import dorknet_tpu
    from dorknet_tpu.network import FeedForwardNetwork
    from dorknet_tpu.network.inference import InferenceRunner
    from dorknet_tpu.network.quantized import QuantizedInferenceRunner

    net = FeedForwardNetwork("export")
    net.load_network_from_json_and_h5(args.json, args.h5)

    if args.bf16:
        dorknet_tpu.set_compute_dtype(jnp.bfloat16)
    if args.dw_weight_only and not args.int8:
        ap.error("--dw-weight-only only applies with --int8")
    if args.int8:
        kw = {}
        if args.dw_weight_only:
            kw["weight_only_kinds"] = ("DepthwiseConvLayer",)
        runner = QuantizedInferenceRunner(
            net, batch_size=args.batch, fold_bn=not args.no_fold_bn, **kw)
    else:
        runner = InferenceRunner(net, batch_size=args.batch,
                                 fold_bn=not args.no_fold_bn)
    if args.scales is not None:
        if not args.int8:
            ap.error("--scales only applies with --int8")
        import json as _json
        import os as _os

        if _os.path.exists(args.scales):
            with open(args.scales) as f:
                scales = _json.load(f)
        else:
            scales = _json.loads(args.scales)
        runner.set_scales(scales)

    C, H, W = (int(d) for d in args.input.split(","))
    platforms = args.platforms.split(",") if args.platforms else None
    data = runner.export_program((H, W), channels=C, path=args.out,
                                 polymorphic_batch=args.polymorphic,
                                 platforms=platforms)
    print("wrote {} ({:.1f} MiB) + {}.meta.json".format(
        args.out, len(data) / 2**20, args.out))


if __name__ == "__main__":
    main()
