"""Training loop: epochs, validation, detection metrics, checkpoints, early stop.

Replaces pl.Trainer + the LSSD3D Lightning hooks (lesions3d/train.py:182-188,
ssd3d.py:467-691) with an explicit loop around jitted steps:

* per-step cosine schedule (inside the optimizer — parity with the
  scheduler-stepped-every-step quirk, ssd3d.py:527-529);
* validation every epoch: losses averaged over batches -> avg_val_loss;
* detection metrics (mAP/P/R/F1 at IoU 0.1 and 0.5) on validation every
  ``compute_metric_every_n_epochs`` epochs and on train every 2n epochs
  (ssd3d.py:499, 563);
* ModelCheckpoint(top-3, avg_val_loss, min) + EarlyStopping(patience 5 on
  total_loss/validation) (train.py:171-180);
* stop on max_steps (default 4000) or max_epochs (train.py:57-58, 182).
"""

from __future__ import annotations

import dataclasses
import time

import jax
import numpy as np

from ..data.augment import AugmentConfig
from ..data.prefetch import prefetch_batches
from ..models.ssd3d import SSD3D, SSD3DConfig, model_priors
from ..ops import metrics as metrics_lib
from ..ops.nms import detections_to_lists
from ..parallel.mesh import batch_sharding, make_mesh, shard_batch
from .checkpoints import CheckpointManager, load_checkpoint
from .logging import MetricsLogger
from .state import create_train_state, make_optimizer
from .steps import make_eval_step, make_train_step


def array_batch(batch: dict) -> dict:
    """Array-only view of a batch dict (jit can't take subject-id strings)."""
    return {k: v for k, v in batch.items() if isinstance(v, (np.ndarray, jax.Array))}


@dataclasses.dataclass
class TrainerConfig:
    logdir: str = "./logs"
    experiment_name: str = "default"
    max_epochs: int | None = None
    max_steps: int = 4000
    early_stopping: bool = True
    early_stopping_patience: int = 5
    compute_metric_every_n_epochs: int = 1
    save_top_k: int = 3
    seed: int = 970205
    use_wandb: bool = False
    data_parallel: bool = False  # shard batches over all visible devices
    hard_negative_mining: bool = False
    log_every_n_steps: int = 1
    max_nonfinite_streak: int = 25  # abort after this many consecutive NaN steps
    verbose: bool = True


class Trainer:
    def __init__(self, trainer_config: TrainerConfig):
        self.cfg = trainer_config

    def _detection_metrics(self, detections, batch, prefix, accum):
        """Accumulate ragged detections + GT for epoch-level mAP."""
        det = {k: np.asarray(v) for k, v in detections.items()}
        keep = np.asarray(batch["batch_mask"])
        det = {k: v[keep] for k, v in det.items()}
        db, dl, ds = detections_to_lists(det)
        accum[prefix]["det"].append((db, dl, ds))
        boxes = np.asarray(batch["boxes"])[keep]
        labels = np.asarray(batch["labels"])[keep]
        mask = np.asarray(batch["box_mask"])[keep]
        gt_b = [boxes[i][mask[i]] for i in range(boxes.shape[0])]
        gt_l = [labels[i][mask[i]] for i in range(labels.shape[0])]
        accum[prefix]["gt"].append((gt_b, gt_l))

    def _finalize_detection_metrics(self, accum, prefix, config, logs, tag):
        det_b, det_l, det_s, gt_b, gt_l = [], [], [], [], []
        for db, dl, ds in accum[prefix]["det"]:
            det_b.extend(db)
            det_l.extend(dl)
            det_s.extend(ds)
        for gb, gl in accum[prefix]["gt"]:
            gt_b.extend(gb)
            gt_l.extend(gl)
        diffs = [np.zeros(len(l), bool) for l in gt_l]
        for iou, suffix in ((0.1, "IoU_0.1"), (0.5, "IoU_0.5")):
            detail = metrics_lib.calculate_mAP(
                det_b, det_l, det_s, gt_b, gt_l, diffs,
                n_classes=config.n_classes, min_overlap=iou, return_detail=True,
            )
            logs[f"mAP/{tag}_{suffix}"] = detail["mAP"]
            if config.n_classes == 2:
                logs[f"precision/{tag}_{suffix}"] = detail["precision"]
                logs[f"recall/{tag}_{suffix}"] = detail["recall"]
                logs[f"f1_score/{tag}_{suffix}"] = detail["f1_score"]

    def fit(self, config: SSD3DConfig, datamodule, augment: AugmentConfig | None = None,
            resume: str | None = None):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        model = SSD3D(config)
        priors = model_priors(config)

        rng, init_rng = jax.random.split(rng)
        state = create_train_state(model, config, init_rng)
        start_epoch = 0
        if resume:
            _, state, meta = load_checkpoint(resume, state_template=state)
            start_epoch = meta["extra"].get("epoch", 0) + 1
            if cfg.verbose:
                print(f"[resume] from {resume} at step {int(state.step)}")

        mesh = make_mesh() if cfg.data_parallel else None

        train_step = make_train_step(
            config, model, priors, augment,
            hard_negative_mining=cfg.hard_negative_mining,
        )
        eval_step = make_eval_step(
            config, model, priors, with_detections=True,
            hard_negative_mining=cfg.hard_negative_mining,
        )

        logger = MetricsLogger(cfg.logdir, cfg.experiment_name, cfg.use_wandb,
                               wandb_config=config.to_json_dict())
        ckpt = CheckpointManager(
            logger.logdir / "checkpoints", monitor="avg_val_loss",
            mode="min", save_top_k=cfg.save_top_k,
        )
        _, schedule = make_optimizer(config.lr, config.scheduler)

        best_val = float("inf")
        patience_left = cfg.early_stopping_patience
        step = int(state.step)
        epoch = start_epoch
        done = False
        history = []
        nonfinite_streak = 0

        while not done:
            if cfg.max_epochs is not None and epoch >= cfg.max_epochs:
                break

            # ---- train epoch ----
            compute_train_metrics = (
                epoch % (cfg.compute_metric_every_n_epochs * 2) == 0
            )
            accum = {"train": {"det": [], "gt": []}, "val": {"det": [], "gt": []}}
            t0 = time.time()
            train_losses = []
            # prefetch: host batch assembly + host->device transfer overlap
            # the previous step's execution (the reference's DataLoader
            # worker analog)
            batches = prefetch_batches(
                (array_batch(b) for b in datamodule.train_batches(epoch=epoch)),
                prefetch=2,
                sharding=batch_sharding(mesh) if mesh is not None else None,
            )
            for batch in batches:
                rng, step_rng = jax.random.split(rng)
                state, m = train_step(state, batch, step_rng)
                step += 1
                train_losses.append(m)
                if float(m.get("nonfinite", 0.0)) > 0:
                    nonfinite_streak += 1
                    if nonfinite_streak >= cfg.max_nonfinite_streak:
                        raise FloatingPointError(
                            f"{nonfinite_streak} consecutive non-finite losses at "
                            f"step {step} — aborting (try a lower learning rate)"
                        )
                else:
                    nonfinite_streak = 0
                if step % cfg.log_every_n_steps == 0:
                    logger.log(
                        {
                            "total_loss/training": m["total_loss"],
                            "confidence_loss/training": m["conf_loss"],
                            "localization_loss/training": m["loc_loss"],
                        },
                        step,
                    )
                if compute_train_metrics:
                    ev = eval_step(state, batch)
                    self._detection_metrics(ev["detections"], batch, "train", accum)
                if cfg.max_steps > 0 and step >= cfg.max_steps:
                    done = True
                    break

            epoch_logs = {}
            if compute_train_metrics and accum["train"]["det"]:
                self._finalize_detection_metrics(accum, "train", config, epoch_logs, "training")

            # ---- validation ----
            compute_val_metrics = epoch % cfg.compute_metric_every_n_epochs == 0
            val_losses = []
            for batch in datamodule.val_batches():
                batch = array_batch(batch)
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                ev = eval_step(state, batch)
                val_losses.append(
                    {k: ev[k] for k in ("total_loss", "conf_loss", "loc_loss")}
                )
                if compute_val_metrics:
                    self._detection_metrics(ev["detections"], batch, "val", accum)

            avg_val = float(np.mean([float(v["total_loss"]) for v in val_losses])) if val_losses else float("nan")
            epoch_logs.update(
                {
                    "avg_val_loss": avg_val,
                    "total_loss/validation": avg_val,
                    "confidence_loss/validation": float(
                        np.mean([float(v["conf_loss"]) for v in val_losses])
                    ) if val_losses else float("nan"),
                    "localization_loss/validation": float(
                        np.mean([float(v["loc_loss"]) for v in val_losses])
                    ) if val_losses else float("nan"),
                    "hp_metric/lr": float(schedule(step)),
                }
            )
            if compute_val_metrics and accum["val"]["det"]:
                self._finalize_detection_metrics(accum, "val", config, epoch_logs, "validation")

            logger.log(epoch_logs, step)
            history.append({"epoch": epoch, **epoch_logs})
            if cfg.verbose:
                msg = (
                    f"[epoch {epoch:3d}] step {step} "
                    f"train_loss={float(np.mean([float(m['total_loss']) for m in train_losses])) if train_losses else float('nan'):.4f} "
                    f"val_loss={avg_val:.4f} "
                    f"({time.time() - t0:.1f}s)"
                )
                if "mAP/validation_IoU_0.1" in epoch_logs:
                    msg += f" mAP@0.1={epoch_logs['mAP/validation_IoU_0.1']:.3f}"
                print(msg, flush=True)

            # ---- checkpoint + early stopping ----
            if np.isfinite(avg_val):
                ckpt.save(state, config, {"avg_val_loss": avg_val}, epoch)
                if avg_val < best_val:
                    best_val = avg_val
                    patience_left = cfg.early_stopping_patience
                elif cfg.early_stopping:
                    patience_left -= 1
                    if patience_left <= 0:
                        if cfg.verbose:
                            print(f"[early stopping] at epoch {epoch}")
                        done = True

            epoch += 1

        logger.close()
        return state, {"history": history, "best_val_loss": best_val,
                       "checkpoint_dir": str(ckpt.root), "best_checkpoint": str(ckpt.best)}
