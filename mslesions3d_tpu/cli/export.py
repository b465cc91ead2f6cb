"""Export a trained checkpoint as a hermetic serving bundle (.mslx).

New capability vs the reference (which serves by re-running its Lightning
predict loop from a Python checkpoint, reference predict.py:235-281): the
end-to-end detection function is AOT-exported as serialized StableHLO with
the trained weights baked in — see mslesions3d_tpu/serving.py.

    msl-export -m logs/run/checkpoints/best -o model.mslx -b 1 8 64
    msl-export -m ... -o model.mslx --platforms cpu tpu     # portable bundle
    msl-export -m ... -o model.mslx --nms_impl pallas       # TPU-only, fused NMS
    msl-export -m ... -o full.mslx --sliding_window 192 224 192 -b 1 4
        # FULL-VOLUME bundle: the whole patch-tile/stitch program baked in
    msl-export -m ... -o q.mslx --quantize int8 --calib_npy calib.npy
        # int8 PTQ bundle (quant.py); composes with --sliding_window —
        # calib.npy is a (N, D, H, W, C) stack of PATCH-sized inputs
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model_path", required=True,
                   help="checkpoint directory (as written by training)")
    p.add_argument("-o", "--output", required=True, help="output .mslx path")
    p.add_argument("-b", "--batch_sizes", nargs="+", type=int, default=[1],
                   help="batch sizes to export (one artifact each)")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering platforms, e.g. cpu tpu (default: current backend)")
    p.add_argument("--nms_impl", default="xla", choices=["xla", "pallas"],
                   help="xla = portable, pallas = fused TPU kernel (single-platform)")
    p.add_argument("-sw", "--sliding_window", nargs=3, type=int, default=None,
                   metavar=("D", "H", "W"),
                   help="export the FULL-VOLUME sliding-window detector for "
                        "volumes of this shape (batch sizes then count "
                        "VOLUMES per request)")
    p.add_argument("--overlap", type=float, default=0.25,
                   help="sliding-window patch overlap fraction")
    p.add_argument("--per_patch_k", type=int, default=None,
                   help="sliding-window: detections kept per patch pre-stitch")
    p.add_argument("-sc", "--min_score", type=float, default=None)
    p.add_argument("-k", "--top_k", type=int, default=None)
    p.add_argument("--dtype", default=None, help="input dtype override (e.g. float32)")
    p.add_argument("--use_ema", type=int, default=1,
                   help="1 = serve the EMA average when the checkpoint has "
                        "one (training with --ema_decay > 0); 0 = raw params "
                        "(mirrors cli.predict)")
    p.add_argument("--platform", default=None,
                   help="jax platform to trace/export on (e.g. cpu)")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="post-training quantization: int8 = BN-fold + "
                        "per-channel int8 weights + int32-accumulated convs "
                        "(quant.py); needs --calib_npy")
    p.add_argument("--calib_npy", default=None,
                   help="calibration volumes for --quantize: a .npy stack "
                        "(N, D, H, W, C) of representative PREPROCESSED "
                        "inputs (e.g. np.save a few batches from your data "
                        "pipeline)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ..serving import (
        export_detector, export_sliding_window_detector, save_bundle,
    )
    from ..train.checkpoints import load_checkpoint

    config, payload, _ = load_checkpoint(args.model_path)
    # EMA-trained checkpoints serve the average by default (same rule as
    # cli.predict); --use_ema 0 exports the raw params instead. Explicit
    # None check: dict truthiness would misread an empty tree.
    ema = payload.get("ema_params")
    params = ema if (bool(args.use_ema) and ema is not None) else payload["params"]
    variables = {"params": params, "batch_stats": payload["batch_stats"]}

    calib = None
    if args.quantize:
        if not args.calib_npy:
            raise SystemExit("--quantize needs --calib_npy (see --help)")
        import numpy as np

        calib = np.load(args.calib_npy)
        # calibration volumes are PATCH-sized (config.input_size) in both
        # modes — the sliding-window program runs the same patch detector
        d, h, w = config.input_size
        if calib.ndim != 5 or calib.shape[1:] != (d, h, w, config.input_channels):
            raise SystemExit(
                f"--calib_npy must be (N, {d}, {h}, {w}, "
                f"{config.input_channels}); got {calib.shape}")

    if args.sliding_window:
        exports, manifest = export_sliding_window_detector(
            config, variables, args.sliding_window, args.batch_sizes,
            overlap=args.overlap, per_patch_k=args.per_patch_k,
            platforms=args.platforms, nms_impl=args.nms_impl,
            min_score=args.min_score, top_k=args.top_k, dtype=args.dtype,
            quantize=args.quantize, calib_images=calib,
        )
    else:
        exports, manifest = export_detector(
            config, variables, args.batch_sizes,
            platforms=args.platforms, nms_impl=args.nms_impl,
            min_score=args.min_score, top_k=args.top_k, dtype=args.dtype,
            quantize=args.quantize, calib_images=calib,
        )
    out = save_bundle(args.output, exports, manifest)
    size = Path(out).stat().st_size
    print(f"[export] wrote {out} ({size / 1e6:.2f} MB): "
          f"batch sizes {manifest['batch_sizes']}, platforms {manifest['platforms']}, "
          f"nms={manifest['nms_impl']}")
    print(json.dumps({k: v for k, v in manifest.items() if k != "config"}, indent=2))
    return out


if __name__ == "__main__":
    main()
