"""Measure int8 PTQ detection quality vs fp32 on the CI-parity dataset.

Loads the run-R checkpoint (the QUALITY.md headline recipe: 24k annealed
steps, torch init), builds the fp32 detector and the int8-quantized detector
(quant.py; calibrated on the first validation batch), runs BOTH over the
full validation split, and prints mAP/P/R/F1 at IoU {0.1, 0.5} over a score
grid — the same operating points QUALITY.md reports for run R.

Runs fine on CPU (the dataset is 64^3): ~2-4 min end to end.

    python tools/quant_quality.py
    QQ_CKPT=path QQ_DATA=path python tools/quant_quality.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

if os.environ.get("QQ_PLATFORM", "cpu"):
    jax.config.update("jax_platforms", os.environ.get("QQ_PLATFORM", "cpu"))

import jax.numpy as jnp
import numpy as np

from mslesions3d_tpu.data.datasets import SyntheticDataModule
from mslesions3d_tpu.models import SSD3D, SSD3DConfig, model_priors
from mslesions3d_tpu.ops import metrics as metrics_lib
from mslesions3d_tpu.ops.nms import detect_objects, detections_to_lists
from mslesions3d_tpu.quant import make_quantized_detection_fn
from mslesions3d_tpu.train.checkpoints import load_checkpoint
from mslesions3d_tpu.utils.cache import enable_compilation_cache

CKPT = Path(os.environ.get(
    "QQ_CKPT", REPO / ".quality_runs/r_logs/R_torchinit/checkpoints/last"))
DATA = Path(os.environ.get("QQ_DATA", REPO / ".quality_runs/ci_64"))
SCORES = (0.1, 0.2, 0.3, 0.5)
IOUS = (0.1, 0.5)


def main():
    enable_compilation_cache()
    config, payload, _ = load_checkpoint(CKPT)
    variables = {"params": payload["params"],
                 "batch_stats": payload["batch_stats"]}
    model = SSD3D(config)
    priors = jnp.asarray(model_priors(config))

    # datamodule n_classes is the DATASET's (no background); the model
    # config counts background as class 0
    dm = SyntheticDataModule(data_dir=DATA, n_classes=config.n_classes - 1,
                             batch_size=4, max_objects=16)
    dm.setup("fit")
    batches = list(dm.val_batches())
    print(f"# validation: {sum(int(b['batch_mask'].sum()) for b in batches)} "
          f"volumes in {len(batches)} batches; ckpt {CKPT.name}")

    calib = np.asarray(batches[0]["image"], np.float32)

    def float_detect(images):
        locs, scores = model.apply(variables, images, train=False)
        return detect_objects(locs, scores, priors, n_classes=config.n_classes,
                              min_score=0.0, max_overlap=config.max_overlap,
                              top_k=100)

    q_detect = make_quantized_detection_fn(config, variables, calib,
                                           min_score=0.0, top_k=100)
    runners = {"fp32": jax.jit(float_detect), "int8": jax.jit(q_detect)}

    dets = {name: ([], [], []) for name in runners}
    gt_boxes, gt_labels = [], []
    for b in batches:
        mask = np.asarray(b["batch_mask"])
        for i in np.flatnonzero(mask):
            bm = np.asarray(b["box_mask"][i])
            gt_boxes.append(np.asarray(b["boxes"][i])[bm])
            gt_labels.append(np.asarray(b["labels"][i])[bm])
        for name, run in runners.items():
            db, dl, ds = detections_to_lists(run(jnp.asarray(b["image"])))
            for i in np.flatnonzero(mask):
                dets[name][0].append(db[i])
                dets[name][1].append(dl[i])
                dets[name][2].append(ds[i])

    results = {}
    for name in runners:
        db, dl, ds = dets[name]
        for iou in IOUS:
            for sc in SCORES:
                kb, kl, ks = [], [], []
                for b_, l_, s_ in zip(db, dl, ds):
                    keep = s_ >= sc
                    if not keep.any():  # background placeholder (eval.py contract)
                        kb.append(np.array([[0, 0, 0, 1, 1, 1.0]], np.float32))
                        kl.append(np.zeros(1, np.int64))
                        ks.append(np.zeros(1, np.float32))
                    else:
                        kb.append(b_[keep]); kl.append(l_[keep]); ks.append(s_[keep])
                diffs = [np.zeros(len(l_), bool) for l_ in gt_labels]
                m = metrics_lib.calculate_mAP(
                    kb, kl, ks, gt_boxes, gt_labels, diffs,
                    n_classes=config.n_classes, min_overlap=iou,
                    return_detail=True,
                )
                results[f"{name}_iou{iou}_sc{sc}"] = {
                    k: round(float(m[k]), 4)
                    for k in ("mAP", "precision", "recall", "f1_score")
                }

    print(f"\n{'operating point':<26} {'fp32 mAP/F1':<18} {'int8 mAP/F1':<18} delta")
    for iou in IOUS:
        for sc in SCORES:
            f = results[f"fp32_iou{iou}_sc{sc}"]
            q = results[f"int8_iou{iou}_sc{sc}"]
            print(f"IoU {iou} score {sc:<4}        "
                  f"{f['mAP']:.3f} / {f['f1_score']:.3f}      "
                  f"{q['mAP']:.3f} / {q['f1_score']:.3f}      "
                  f"{q['mAP'] - f['mAP']:+.3f} / {q['f1_score'] - f['f1_score']:+.3f}")
    out = REPO / ".quality_runs" / "quant_quality.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(f"\n# wrote {out}")


if __name__ == "__main__":
    main()
