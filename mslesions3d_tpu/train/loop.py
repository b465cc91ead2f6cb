"""Training loop: epochs, validation, detection metrics, checkpoints, early stop.

Replaces pl.Trainer + the LSSD3D Lightning hooks (lesions3d/train.py:182-188,
ssd3d.py:467-691) with an explicit loop around jitted steps:

* per-step cosine schedule (inside the optimizer — parity with the
  scheduler-stepped-every-step quirk, ssd3d.py:527-529);
* validation every epoch: losses averaged over batches (weighted by the
  real sample count so padded partial batches don't bias the mean) ->
  avg_val_loss;
* detection metrics (mAP/P/R/F1 at IoU 0.1 and 0.5) on validation every
  ``compute_metric_every_n_epochs`` epochs and on train every 2n epochs
  (ssd3d.py:499, 563), computed per batch and averaged over batches like
  the reference's *_epoch_end hooks (ssd3d.py:588-690) — NOT one global
  mAP over the epoch's pooled detections (the two aggregations differ);
  train-epoch metrics come from the TRAINING forward (augmented batch),
  not an extra eval forward;
* gradient histograms every ``grad_hist_every_n_steps`` steps
  (ssd3d.py:729-738) and the parameter-L1 scalar hp_metric/parameter_sizes
  on train-metric epochs (ssd3d.py:689-690);
* ModelCheckpoint(top-3, avg_val_loss, min) + EarlyStopping(patience 5 on
  total_loss/validation) (train.py:171-180);
* stop on max_steps (default 4000) or max_epochs (train.py:57-58, 182).

The hot loop is sync-free: per-step metrics stay on device, the host only
converts them on the logging cadence (``log_every_n_steps``) and at epoch
end in one bulk device_get, so dispatch runs ahead of the device and the
prefetch pipeline (data/prefetch.py) actually overlaps. The non-finite-loss
streak is carried on device in TrainState and checked on the same cadence.
"""

from __future__ import annotations

import dataclasses
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.augment import AugmentConfig
from ..data.prefetch import prefetch_batches
from ..models.ssd3d import SSD3D, SSD3DConfig, model_priors
from ..ops import metrics as metrics_lib
from ..ops.nms import detections_to_lists
from ..parallel.mesh import batch_sharding, make_mesh, shard_batch
from .checkpoints import CheckpointManager, load_checkpoint
from .logging import MetricsLogger
from .state import create_train_state, eval_view, make_optimizer
from .steps import (
    make_eval_step,
    make_gathered_eval_step,
    make_gathered_train_epoch,
    make_gathered_train_step,
    make_sharded_gathered_train_step,
    make_train_step,
)


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
    # > 1 shards volume DEPTH over that many devices on a ("data", "spatial")
    # mesh (remaining devices form the data axis) — the full-resolution
    # path for volumes too large for one chip's HBM: per-device activations
    # and FLOPs both scale ~1/N via XLA's conv halo exchanges
    # (parallel/spatial.py; measured 0.18x memory/device at SP8, QUALITY.md)
    spatial_shards: int = 1
    # train on random lesion-biased patches of config.input_size cropped ON
    # DEVICE from full-resolution volumes (data/patches.py); validation uses
    # a deterministic lesion-centered crop. The datamodule must yield
    # volumes >= the patch on every axis. Pair with sliding-window predict
    # for the train-on-patches / infer-full-volume pipeline.
    patch_training: bool = False
    patch_pos_fraction: float = 0.7
    # > 1 splits each batch into that many micro-batches scanned with
    # gradient averaging before ONE optimizer update — activation memory of
    # one micro-batch, effective batch of the full one (steps.py)
    grad_accum: int = 1
    # under patch training, ALSO score full-volume detections (sliding
    # window over each val volume) on the metric cadence — the deployment
    # metric, logged as mAP/validation_full_*; the patch-crop val loss
    # remains the checkpoint-selection monitor
    patch_val_full_volume: bool = True
    hard_negative_mining: bool = False
    # keep the materialized dataset in HBM and gather batches on device by
    # index (kills the per-step host->device volume transfer — on a tunneled
    # TPU that transfer, not compute, bounds training). Streaming fallback
    # for data_parallel, datasets over the byte cap, or < 1 full batch.
    device_data_cache: bool = True
    device_cache_max_bytes: int = 4 << 30
    # scan whole NON-METRIC epochs into one device program (device-resident
    # cache only): one dispatch per epoch instead of per step — on a
    # tunneled TPU the per-step host work costs several times the step
    # itself. Trade-off: gradient histograms then attach to metric/
    # instrumented epochs (every compute_metric_every_n_epochs*2) instead of
    # a strict every-25-steps cadence.
    epoch_scan: bool = True
    log_every_n_steps: int = 10
    grad_hist_every_n_steps: int = 25  # TB grad histograms (0 = off)
    # abort after this many consecutive non-finite steps; detected on the
    # log_every_n_steps cadence, so the actual abort happens within
    # max_nonfinite_streak + log_every_n_steps steps of the first blip
    max_nonfinite_streak: int = 25
    verbose: bool = True


class Trainer:
    def __init__(self, trainer_config: TrainerConfig):
        self.cfg = trainer_config

    def _detection_metrics(self, detections, boxes, labels, box_mask, batch_mask,
                           prefix, accum):
        """Queue one batch's detections + GT for epoch metrics.

        Everything is appended as-is (device arrays stay on device) — no
        sync happens here; _finalize_detection_metrics does one bulk
        device_get at epoch end so dispatch keeps running ahead.
        """
        accum[prefix].append(
            {"det": detections, "boxes": boxes, "labels": labels,
             "box_mask": box_mask, "batch_mask": batch_mask}
        )

    def _finalize_detection_metrics(self, accum, prefix, config, logs, tag):
        """Per-batch mAP/P/R/F1 averaged over batches (reference parity:
        *_epoch_end averages the per-batch metric dicts, ssd3d.py:588-690 —
        a different number than one global mAP over pooled detections)."""
        batches = jax.device_get(accum[prefix])
        per_iou = {0.1: [], 0.5: []}
        for b in batches:
            keep = np.asarray(b["batch_mask"])
            det = {k: np.asarray(v)[keep] for k, v in b["det"].items()}
            db, dl, ds = detections_to_lists(det)
            boxes = np.asarray(b["boxes"])[keep]
            labels = np.asarray(b["labels"])[keep]
            mask = np.asarray(b["box_mask"])[keep]
            gt_b = [boxes[i][mask[i]] for i in range(boxes.shape[0])]
            gt_l = [labels[i][mask[i]] for i in range(labels.shape[0])]
            diffs = [np.zeros(len(l), bool) for l in gt_l]
            for iou in per_iou:
                detail = metrics_lib.calculate_mAP(
                    db, dl, ds, gt_b, gt_l, diffs,
                    n_classes=config.n_classes, min_overlap=iou,
                    return_detail=True,
                )
                per_iou[iou].append(detail)
        for iou, suffix in ((0.1, "IoU_0.1"), (0.5, "IoU_0.5")):
            details = per_iou[iou]
            if not details:
                continue
            logs[f"mAP/{tag}_{suffix}"] = float(np.mean([d["mAP"] for d in details]))
            if config.n_classes == 2:
                for key in ("precision", "recall", "f1_score"):
                    logs[f"{key}/{tag}_{suffix}"] = float(
                        np.mean([d[key] for d in details])
                    )

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

        spatial = max(1, int(cfg.spatial_shards))
        if spatial > 1:
            from ..parallel.spatial import (
                batch_sharding_fn, make_mesh_2d, shard_batch_spatial,
            )

            ndev = len(jax.devices())
            if ndev % spatial:
                raise ValueError(
                    f"spatial_shards={spatial} does not divide the "
                    f"{ndev} visible devices"
                )
            if config.input_size[0] % spatial:
                raise ValueError(
                    f"volume depth {config.input_size[0]} is not divisible "
                    f"by spatial_shards={spatial}"
                )
            n_data = ndev // spatial if cfg.data_parallel else 1
            if n_data > 1 and config.batch_size % n_data:
                # cap the data axis so it divides the batch (the remaining
                # devices idle rather than erroring on the batch device_put)
                n_data = math.gcd(n_data, config.batch_size)
                if cfg.verbose:
                    print(f"[mesh] data axis capped to {n_data} "
                          f"(batch {config.batch_size} not divisible by "
                          f"{ndev // spatial})")
            mesh = make_mesh_2d(n_data, spatial)
        else:
            mesh = make_mesh() if cfg.data_parallel else None
        spatial_mesh = spatial > 1

        # depth-sharded batches REQUIRE the activation constraint mesh: the
        # deep backbone's backward pass miscompiles without it
        # (parallel/spatial.py::spatial_activation_interceptor)
        cmesh = mesh if spatial_mesh else None
        patch_kw = dict(patch_training=cfg.patch_training,
                        patch_pos_fraction=cfg.patch_pos_fraction,
                        grad_accum=max(1, int(cfg.grad_accum)))
        train_step = make_train_step(
            config, model, priors, augment,
            hard_negative_mining=cfg.hard_negative_mining,
            constraint_mesh=cmesh, **patch_kw,
        )
        # instrumented variant: decode+NMS on the training forward (train
        # metric epochs) + raw grads (TB histograms); compiled separately so
        # the plain hot path carries no extra outputs
        train_step_instr = make_train_step(
            config, model, priors, augment,
            hard_negative_mining=cfg.hard_negative_mining,
            with_detections=True, return_grads=cfg.grad_hist_every_n_steps > 0,
            constraint_mesh=cmesh, **patch_kw,
        )
        eval_step = make_eval_step(
            config, model, priors, with_detections=True,
            hard_negative_mining=cfg.hard_negative_mining,
            constraint_mesh=cmesh, patch_training=cfg.patch_training,
        )

        # ---- data path ----
        # Device-resident dataset when it fits in HBM: materialize once,
        # device_put once, gather batches on device by index. On a tunneled
        # TPU the per-step host->HBM transfer (megabytes/step) is the
        # training bottleneck — with the cache the host sends only int32
        # indices. Falls back to streaming+prefetch for data-parallel
        # meshes, oversized datasets, or sub-batch-size debug runs.
        train_data = val_data = host_val = None
        n_train = n_val = 0
        sharded_cache = False
        n_local = 0
        can_materialize = all(
            hasattr(datamodule, a) for a in ("materialize", "trainsubs", "testsubs")
        )  # duck-typed custom datamodules fall back to streaming
        kw = dict(hard_negative_mining=cfg.hard_negative_mining, **patch_kw)
        if cfg.device_data_cache and mesh is None and can_materialize:
            host_train = datamodule.materialize(datamodule.trainsubs)
            host_val = datamodule.materialize(datamodule.testsubs)
            nbytes = sum(
                v.nbytes for d in (host_train, host_val)
                for v in d.values() if isinstance(v, np.ndarray)
            )
            n_train = host_train["image"].shape[0]
            n_val = host_val["image"].shape[0]
            if nbytes <= cfg.device_cache_max_bytes and n_train >= datamodule.batch_size:
                arrays = lambda d: {k: jax.device_put(v) for k, v in d.items()
                                    if isinstance(v, np.ndarray)}
                train_data = arrays(host_train)
                val_data = arrays(host_val)
                if cfg.verbose:
                    print(f"[data] device-resident cache: {n_train} train / "
                          f"{n_val} val volumes, {nbytes / 2**20:.0f} MiB HBM")
            else:
                host_val = None
        elif (cfg.device_data_cache and mesh is not None and can_materialize
              and not spatial_mesh):
            # data-parallel: shard the materialized dataset over the mesh —
            # every chip keeps only its subject shard in HBM, samples
            # shard-locally, and never streams volumes from the host; the
            # grad all-reduce stays the only cross-chip traffic
            ndev = int(np.prod(list(mesh.shape.values())))
            B = datamodule.batch_size
            if B % ndev == 0 and len(datamodule.trainsubs) >= B:
                host_train = datamodule.materialize(datamodule.trainsubs)
                arrays = {k: v for k, v in host_train.items()
                          if isinstance(v, np.ndarray)}
                n_train = arrays["image"].shape[0]
                n_local = -(-n_train // ndev)
                pad = n_local * ndev - n_train
                if pad:  # wrap-around duplicates (training-only sampling)
                    arrays = {k: np.concatenate([v, v[:pad]]) for k, v in arrays.items()}
                nbytes = sum(v.nbytes for v in arrays.values())
                if nbytes <= cfg.device_cache_max_bytes * ndev:
                    sharding = batch_sharding(mesh)
                    train_data = {k: jax.device_put(v, sharding)
                                  for k, v in arrays.items()}
                    sharded_cache = True
                    if cfg.verbose:
                        print(f"[data] sharded device cache: {n_local} "
                              f"volumes/chip x {ndev} chips "
                              f"({nbytes / 2**20:.0f} MiB total)")
        if sharded_cache:
            train_step_g = make_sharded_gathered_train_step(
                config, model, priors, mesh, augment, **kw)
            train_step_instr_g = make_sharded_gathered_train_step(
                config, model, priors, mesh, augment, with_detections=True,
                return_grads=cfg.grad_hist_every_n_steps > 0, **kw)
        elif train_data is not None:
            train_step_g = make_gathered_train_step(config, model, priors, augment, **kw)
            train_step_instr_g = make_gathered_train_step(
                config, model, priors, augment, with_detections=True,
                return_grads=cfg.grad_hist_every_n_steps > 0, **kw)
            eval_step_g = make_gathered_eval_step(
                config, model, priors, with_detections=True,
                hard_negative_mining=cfg.hard_negative_mining,
                patch_training=cfg.patch_training)
            train_epoch_g = make_gathered_train_epoch(
                config, model, priors, augment, **kw)

        # full-volume val detections under patch training: lazily built
        # sliding-window detectors keyed by (volume shape, stack size)
        sw_val_detectors: dict = {}

        def sw_val_detect(val_state, images):
            from ..sliding_window import make_sliding_window_detector

            # pad a final PARTIAL stack up to an already-compiled stack size
            # for this volume shape (as predict.py's throughput mode does)
            # and drop the padded rows from the result: a second full
            # sliding-window compile for one metric pass is multi-minute on
            # the tunneled TPU
            n = images.shape[0]
            standing = [k[1] for k in sw_val_detectors if k[0] == images.shape[1:4]]
            std = min((s for s in standing if s >= n), default=n)
            if n < std:
                images = jnp.concatenate(
                    [images, jnp.broadcast_to(images[-1:],
                                              (std - n, *images.shape[1:]))],
                    axis=0,
                )
            key = (images.shape[1:4], images.shape[0])
            if key not in sw_val_detectors:
                sw_val_detectors[key] = make_sliding_window_detector(
                    config, key[0], volume_batch=key[1]
                )
            variables = {"params": val_state.params,
                         "batch_stats": val_state.batch_stats}
            det = sw_val_detectors[key](variables, images)
            if n < std:
                det = {k: v[:n] if getattr(v, "ndim", 0) >= 1 else v
                       for k, v in det.items()}
            return det

        sw_val_on = cfg.patch_training and cfg.patch_val_full_volume

        logger = MetricsLogger(cfg.logdir, cfg.experiment_name, cfg.use_wandb,
                               wandb_config=config.to_json_dict())
        ckpt = CheckpointManager(
            logger.logdir / "checkpoints", monitor="avg_val_loss",
            mode="min", save_top_k=cfg.save_top_k,
        )
        _, schedule = make_optimizer(config.lr, config.scheduler, t_max=config.t_max)

        best_val = float("inf")
        patience_left = cfg.early_stopping_patience
        step = int(state.step)
        epoch = start_epoch
        done = False
        history = []

        def check_streak(metrics_host):
            streak = int(metrics_host.get("nonfinite_streak", 0))
            if streak >= cfg.max_nonfinite_streak:
                raise FloatingPointError(
                    f"{streak} consecutive non-finite losses at step {step} "
                    f"— aborting (try a lower learning rate)"
                )

        while not done:
            if cfg.max_epochs is not None and epoch >= cfg.max_epochs:
                break

            # ---- train epoch ----
            # interval 0 = never (the reference has no disable switch;
            # 0 would modulo-crash there too, so this is a strict extension)
            metric_interval = cfg.compute_metric_every_n_epochs
            compute_train_metrics = (
                metric_interval > 0 and epoch % (metric_interval * 2) == 0
            )
            accum = {"train": [], "val": [], "val_full": []}
            t0 = time.time()
            train_losses = []
            if train_data is not None:
                # device-resident path: shuffle indices on host, gather on
                # device — per-step transfer is one tiny int32 vector
                B = datamodule.batch_size
                rg = np.random.default_rng((cfg.seed or 0) + epoch)
                if sharded_cache:
                    # block d of each index vector holds SHARD-LOCAL indices
                    # for device d (each replica shuffles its own shard)
                    ndev = int(np.prod(list(mesh.shape.values())))
                    b_local = B // ndev
                    perms = [rg.permutation(n_local) for _ in range(ndev)]
                    batches = [
                        np.concatenate(
                            [p[s * b_local:(s + 1) * b_local] for p in perms]
                        ).astype(np.int32)
                        for s in range(n_local // b_local)
                    ]
                else:
                    perm = rg.permutation(n_train)
                    batches = [perm[i:i + B].astype(np.int32)
                               for i in range(0, n_train - B + 1, B)]
            else:
                # streaming path: host batch assembly + host->device transfer
                # overlap the previous step's execution (the reference's
                # DataLoader worker analog)
                if mesh is None:
                    stream_sharding = None
                elif spatial_mesh:
                    # volumes depth-sharded on "spatial", rows on "data"
                    stream_sharding = batch_sharding_fn(mesh)
                else:
                    stream_sharding = batch_sharding(mesh)
                batches = prefetch_batches(
                    (array_batch(b) for b in datamodule.train_batches(epoch=epoch)),
                    prefetch=2,
                    sharding=stream_sharding,
                )
            # per-step keys derive from one per-epoch key: fold_in(epoch_rng,
            # global step). The scanned-epoch program derives the SAME keys on
            # device from state.step, so scanned and stepped epochs are
            # numerically identical.
            rng, epoch_rng = jax.random.split(rng)

            use_epoch_scan = (
                cfg.epoch_scan and train_data is not None and not sharded_cache
                and not compute_train_metrics and isinstance(batches, list)
                and len(batches) > 0
            )
            if use_epoch_scan:
                # one device program for the whole epoch: no per-step host
                # work (rng ops, index uploads, dispatch round trips)
                if cfg.max_steps > 0:
                    batches = batches[: max(cfg.max_steps - step, 0)]
                use_epoch_scan = len(batches) > 0
            if use_epoch_scan:
                idx_mat = jnp.asarray(np.stack(batches).astype(np.int32))
                state, ms = train_epoch_g(state, train_data, idx_mat, epoch_rng)
                host_ms = jax.device_get(ms)
                for i in range(idx_mat.shape[0]):
                    step += 1
                    train_losses.append(
                        {k: host_ms[k][i]
                         for k in ("total_loss", "conf_loss", "loc_loss")}
                    )
                    if step % cfg.log_every_n_steps == 0:
                        check_streak({"nonfinite_streak": host_ms["nonfinite_streak"][i]})
                        logger.log(
                            {
                                "total_loss/training": host_ms["total_loss"][i],
                                "confidence_loss/training": host_ms["conf_loss"][i],
                                "localization_loss/training": host_ms["loc_loss"][i],
                                "grad_norm/training": host_ms["grad_norm"][i],
                            },
                            step,
                        )
                batches = []  # consumed
                if cfg.max_steps > 0 and step >= cfg.max_steps:
                    done = True

            for batch in batches:
                step_rng = jax.random.fold_in(epoch_rng, step)
                grad_hist = (
                    cfg.grad_hist_every_n_steps > 0
                    and step % cfg.grad_hist_every_n_steps == 0
                )
                instrumented = compute_train_metrics or grad_hist
                if train_data is not None:
                    fn = train_step_instr_g if instrumented else train_step_g
                    idx = (jax.device_put(batch, batch_sharding(mesh))
                           if sharded_cache else jnp.asarray(batch))
                    state, m = fn(state, train_data, idx, step_rng)
                    batch_mask = np.ones(len(batch), bool)
                else:
                    fn = train_step_instr if instrumented else train_step
                    state, m = fn(state, batch, step_rng)
                    batch_mask = batch["batch_mask"]
                step += 1
                # device arrays only — converted in bulk at epoch end
                train_losses.append(
                    {k: m[k] for k in ("total_loss", "conf_loss", "loc_loss")}
                )
                if grad_hist:
                    logger.log_histograms(m["grads"], step - 1, prefix="epoch/")
                if compute_train_metrics:
                    self._detection_metrics(
                        m["detections"], m["aug_boxes"], m["aug_labels"],
                        m["aug_box_mask"], batch_mask, "train", accum,
                    )
                if step % cfg.log_every_n_steps == 0:
                    host_m = jax.device_get(
                        {k: m[k] for k in ("total_loss", "conf_loss", "loc_loss",
                                            "nonfinite_streak", "grad_norm")}
                    )
                    check_streak(host_m)
                    logger.log(
                        {
                            "total_loss/training": host_m["total_loss"],
                            "confidence_loss/training": host_m["conf_loss"],
                            "localization_loss/training": host_m["loc_loss"],
                            "grad_norm/training": host_m["grad_norm"],
                        },
                        step,
                    )
                if cfg.max_steps > 0 and step >= cfg.max_steps:
                    done = True
                    break
            if cfg.max_steps > 0 and step >= cfg.max_steps:
                done = True  # also covers epochs emptied by scan truncation
            # epoch boundary: one authoritative streak check (covers runs
            # whose divergence never lands on the logging cadence)
            check_streak({"nonfinite_streak": jax.device_get(state.nonfinite_streak)})

            epoch_logs = {}
            if compute_train_metrics and accum["train"]:
                self._finalize_detection_metrics(accum, "train", config, epoch_logs, "training")
                # parameter L1 scalar, logged with train metrics like the
                # reference's training_epoch_end (ssd3d.py:689-690)
                epoch_logs["hp_metric/parameter_sizes"] = float(
                    sum(np.abs(np.asarray(p)).sum()
                        for p in jax.tree_util.tree_leaves(jax.device_get(state.params)))
                )

            # ---- validation ----
            # scored on the EMA params when config.ema_decay > 0 (eval_view),
            # so checkpoint selection/early stopping track the average
            compute_val_metrics = (
                cfg.compute_metric_every_n_epochs > 0
                and epoch % cfg.compute_metric_every_n_epochs == 0
            )
            val_state = eval_view(state)
            val_losses = []
            if val_data is not None:
                B = datamodule.batch_size
                for i in range(0, n_val, B):
                    ids = np.arange(i, i + B)
                    valid = ids < n_val
                    ids = np.minimum(ids, n_val - 1).astype(np.int32)
                    ev = eval_step_g(val_state, val_data, jnp.asarray(ids),
                                     jnp.asarray(valid))
                    val_losses.append(
                        {k: ev[k] for k in ("total_loss", "conf_loss",
                                             "loc_loss", "n_valid")}
                    )
                    if compute_val_metrics:
                        # patch eval returns the patch-frame GT alongside
                        # the patch-frame detections (steps.py)
                        self._detection_metrics(
                            ev["detections"],
                            ev.get("gt_boxes", host_val["boxes"][ids]),
                            ev.get("gt_labels", host_val["labels"][ids]),
                            (np.asarray(ev["gt_box_mask"]) & valid[:, None]
                             if "gt_box_mask" in ev
                             else host_val["box_mask"][ids] & valid[:, None]),
                            valid, "val", accum,
                        )
                        if sw_val_on:
                            rows = ids[valid]
                            det = sw_val_detect(
                                val_state, jnp.asarray(host_val["image"][rows])
                            )
                            self._detection_metrics(
                                det, host_val["boxes"][rows],
                                host_val["labels"][rows],
                                host_val["box_mask"][rows],
                                np.ones(len(rows), bool), "val_full", accum,
                            )
            else:
                for batch in datamodule.val_batches():
                    host_batch = batch = array_batch(batch)
                    if mesh is not None:
                        batch = (shard_batch_spatial(batch, mesh) if spatial_mesh
                                 else shard_batch(batch, mesh))
                    ev = eval_step(val_state, batch)
                    val_losses.append(
                        {k: ev[k] for k in ("total_loss", "conf_loss",
                                             "loc_loss", "n_valid")}
                    )
                    if compute_val_metrics:
                        self._detection_metrics(
                            ev["detections"],
                            ev.get("gt_boxes", batch["boxes"]),
                            ev.get("gt_labels", batch["labels"]),
                            ev.get("gt_box_mask", batch["box_mask"]),
                            batch["batch_mask"], "val", accum,
                        )
                        if sw_val_on:
                            keep = np.asarray(host_batch["batch_mask"])
                            imgs = np.asarray(host_batch["image"])[keep]
                            if imgs.shape[0]:
                                det = sw_val_detect(val_state, jnp.asarray(imgs))
                                self._detection_metrics(
                                    det,
                                    np.asarray(host_batch["boxes"])[keep],
                                    np.asarray(host_batch["labels"])[keep],
                                    np.asarray(host_batch["box_mask"])[keep],
                                    np.ones(int(keep.sum()), bool),
                                    "val_full", accum,
                                )

            # one bulk transfer for the epoch's train + val losses
            train_losses = jax.device_get(train_losses)
            val_losses = jax.device_get(val_losses)

            def weighted_val(key):
                # per-batch losses are means over VALID samples; weight by
                # that count so a padded partial final batch doesn't skew
                # the epoch mean (and checkpoint selection with it)
                if not val_losses:
                    return float("nan")
                w = np.asarray([v["n_valid"] for v in val_losses], np.float64)
                x = np.asarray([v[key] for v in val_losses], np.float64)
                return float((x * w).sum() / max(w.sum(), 1.0))

            avg_val = weighted_val("total_loss")
            epoch_logs.update(
                {
                    "avg_val_loss": avg_val,
                    "total_loss/validation": avg_val,
                    "confidence_loss/validation": weighted_val("conf_loss"),
                    "localization_loss/validation": weighted_val("loc_loss"),
                    "hp_metric/lr": float(schedule(step)),
                }
            )
            if compute_val_metrics and accum["val"]:
                self._finalize_detection_metrics(accum, "val", config, epoch_logs, "validation")
            if compute_val_metrics and accum["val_full"]:
                self._finalize_detection_metrics(
                    accum, "val_full", config, epoch_logs, "validation_full")

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
                if "mAP/validation_full_IoU_0.1" in epoch_logs:
                    msg += (" full-vol mAP@0.1="
                            f"{epoch_logs['mAP/validation_full_IoU_0.1']:.3f}")
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
