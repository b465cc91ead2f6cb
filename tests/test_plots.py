"""Plots CLI: metric heatmaps + found/not-found volume boxplots."""

import json

import numpy as np


def _write_metrics(d, iou, score, found, not_found):
    (d / f"metrics_(min_IoU={iou}_min_score={score}).json").write_text(
        json.dumps({
            "mAP": 0.5, "precision": 0.6, "recall": 0.7, "f1_score": 0.65,
            "found_boxes_volumes_per_class": found,
            "not_found_boxes_volumes_per_class": not_found,
        })
    )


def test_plots_cli_heatmap_and_boxplot(tmp_path):
    from mslesions3d_tpu.cli import plots as plots_cli

    rng = np.random.default_rng(0)
    big = (rng.uniform(10, 14, 12) ** 3 / 64**3).tolist()
    small = (rng.uniform(6, 8, 8) ** 3 / 64**3).tolist()
    _write_metrics(tmp_path, 0.1, 0.1, big, small)
    _write_metrics(tmp_path, 0.5, 0.5, big, small)

    plots_cli.main(["-pd", str(tmp_path)])
    assert (tmp_path / "heatmap_mAP.png").exists()
    assert (tmp_path / "boxplot_found_volumes.png").exists()


def test_plot_found_volumes_multiclass_dict(tmp_path):
    """Per-class dict form (multi-class eval JSONs) flattens correctly."""
    from mslesions3d_tpu.cli.plots import plot_found_volumes

    (tmp_path / "metrics_(min_IoU=0.5_min_score=0.2).json").write_text(
        json.dumps({
            "mAP": 0.4,
            "found_boxes_volumes_per_class": {"1": [0.002, 0.004], "2": [0.003]},
            "not_found_boxes_volumes_per_class": {"1": [0.001], "2": [0.0008]},
        })
    )
    out = plot_found_volumes(tmp_path, tmp_path)
    assert out is not None and out.exists()


def test_plot_found_volumes_no_data(tmp_path):
    from mslesions3d_tpu.cli.plots import plot_found_volumes

    _write_metrics(tmp_path, 0.5, 0.5, [], [])
    assert plot_found_volumes(tmp_path, tmp_path) is None


def test_stats_foreground(tmp_path):
    from mslesions3d_tpu.data import generate_dataset
    from mslesions3d_tpu.data.datasets import SyntheticDataModule, stats_foreground

    generate_dataset(
        tmp_path / "d", num_images=3, n_classes=1, image_size=(16, 16, 16),
        object_size=(5, 8), num_objects=(1, 2), seed=0,
    )
    dm = SyntheticDataModule(tmp_path / "d", n_classes=1, batch_size=2)
    shapes, pixdims = stats_foreground(dm)
    assert shapes == [(16, 16, 16)] * 3
    assert pixdims == [(1.0, 1.0, 1.0)] * 3
