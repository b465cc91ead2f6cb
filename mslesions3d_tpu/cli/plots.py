"""Metric plots: heatmaps of mAP/precision/recall/F1 vs (IoU x score threshold).

Parity target: lesions3d/plots.py:57-81 — reads the eval CLI's
metrics_(min_IoU=<x>_min_score=<y>).json files from a prediction directory
and renders one heatmap per metric.
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

METRIC_FILE = re.compile(r"metrics_\(min_IoU=(?P<iou>[\d.]+)_min_score=(?P<score>[\d.]+)\)\.json")


def load_metric_grid(prediction_dir):
    """Collect metric JSONs into {metric: {(iou, score): value}}."""
    grids: dict = {}
    for path in Path(prediction_dir).glob("metrics_*.json"):
        m = METRIC_FILE.match(path.name)
        if not m:
            continue
        iou, score = float(m["iou"]), float(m["score"])
        data = json.loads(path.read_text())
        for key in ("mAP", "precision", "recall", "f1_score"):
            if isinstance(data.get(key), (int, float)):
                grids.setdefault(key, {})[(iou, score)] = float(data[key])
    return grids


def plot_metric(grids, metric, output_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    import pandas as pd
    import seaborn as sns

    cells = grids[metric]
    ious = sorted({k[0] for k in cells})
    scores = sorted({k[1] for k in cells})
    table = pd.DataFrame(
        [[cells.get((i, s), np.nan) for s in scores] for i in ious],
        index=ious, columns=scores,
    )
    plt.figure(figsize=(1 + len(scores), 1 + 0.6 * len(ious)))
    sns.heatmap(table, annot=True, fmt=".3f", cmap="viridis", vmin=0, vmax=1)
    plt.xlabel("min score")
    plt.ylabel("min IoU")
    plt.title(metric)
    plt.tight_layout()
    out = Path(output_dir) / f"heatmap_{metric}.png"
    plt.savefig(out, dpi=110)
    plt.close()
    return out


def main(argv=None):
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("-pd", "--prediction_dir", type=str, required=True,
                   help="directory containing metrics_(min_IoU=..._min_score=...).json files")
    p.add_argument("-o", "--output_dir", type=str, default=None)
    args = p.parse_args(argv)

    out_dir = Path(args.output_dir or args.prediction_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    grids = load_metric_grid(args.prediction_dir)
    if not grids:
        raise SystemExit(f"no metrics_*.json files found in {args.prediction_dir}")
    for metric in grids:
        path = plot_metric(grids, metric, out_dir)
        print(f"[plots] {metric} -> {path}")


if __name__ == "__main__":
    main()
