"""Checkpointing: top-k retention on a monitored metric, hparams-in-checkpoint,
resume — the reference's ModelCheckpoint semantics (lesions3d/train.py:171-176:
monitor=avg_val_loss, save_top_k=3, mode=min; hparams embedded via
save_hyperparameters so load_from_checkpoint can rebuild the model,
ssd3d.py:206, predict.py:257).

Format: flax msgpack state file + JSON metadata (config + monitored metrics)
per checkpoint directory. Synchronous single-file writes — the async orbax
machinery is unnecessary at these model sizes (and deadlocks on single-core
hosts); the on-disk contract here is stable and dependency-light.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import jax
import numpy as np
from flax import serialization

from ..models.ssd3d import SSD3DConfig


def _to_host(tree):
    # jax.device_get issues async copies for every leaf before blocking —
    # one batched readback instead of a per-leaf round trip (6 s -> ~0.1 s
    # per save on a tunneled TPU with ~200 leaves)
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


def save_checkpoint(directory, state, config: SSD3DConfig, metrics: dict | None = None,
                    extra: dict | None = None):
    """Write one checkpoint: state.msgpack + meta.json."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    payload = {
        "step": np.asarray(state.step),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_state": _to_host(state.opt_state),
    }
    if getattr(state, "ema_params", None) is not None:
        payload["ema_params"] = _to_host(state.ema_params)
    (directory / "state.msgpack").write_bytes(serialization.to_bytes(payload))
    meta = {
        "step": int(state.step),
        "config": config.to_json_dict(),
        "metrics": {k: float(v) for k, v in (metrics or {}).items()},
        "extra": extra or {},
    }
    (directory / "meta.json").write_text(json.dumps(meta, indent=2))
    return directory


def load_checkpoint(directory, state_template=None):
    """Load (config, payload) from a checkpoint dir.

    With a state_template (a TrainState from create_train_state), the full
    training state is restored into it; otherwise raw numpy trees return
    (enough for inference: params + batch_stats).
    """
    directory = Path(directory)
    meta = json.loads((directory / "meta.json").read_text())
    config = SSD3DConfig.from_json_dict(meta["config"])
    raw = (directory / "state.msgpack").read_bytes()

    if state_template is not None:
        stored = serialization.msgpack_restore(raw)
        restore = lambda tmpl, key: serialization.from_state_dict(
            tmpl, stored[key], name=key
        )
        params = restore(state_template.params, "params")
        if "ema_params" in stored and state_template.ema_params is None:
            # EMA-trained checkpoint resumed with ema_decay=0: the step
            # would never update the stale average, yet eval_view prefers
            # it — validation/checkpoint-selection would score frozen
            # weights while training moves the raw params. Drop it.
            # (predict/export are unaffected: they build the template from
            # the checkpoint's own config.)
            import warnings

            warnings.warn(
                "checkpoint holds ema_params but the resumed run has "
                "ema_decay=0 — dropping the stale EMA; raw params will be "
                "trained and evaluated", stacklevel=2,
            )
            ema = None
        elif "ema_params" in stored:
            ema = serialization.from_state_dict(
                state_template.ema_params, stored["ema_params"],
                name="ema_params",
            )
        else:
            # pre-EMA checkpoint resumed with ema_decay on: re-seed from the
            # restored params (the create_train_state seeding rule)
            ema = (jax.tree_util.tree_map(jax.numpy.copy, params)
                   if state_template.ema_params is not None else None)
        state = state_template.replace(
            step=jax.numpy.asarray(stored["step"]),
            params=params,
            batch_stats=restore(state_template.batch_stats, "batch_stats"),
            opt_state=restore(state_template.opt_state, "opt_state"),
            ema_params=ema,
        )
        return config, state, meta
    payload = serialization.msgpack_restore(raw)
    return config, payload, meta


class CheckpointManager:
    """Top-k retention on a monitored metric (min or max)."""

    def __init__(self, root, monitor: str = "avg_val_loss", mode: str = "min",
                 save_top_k: int = 3):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self._kept: list[tuple[float, Path]] = []
        self._restore_index()

    def _restore_index(self):
        for d in sorted(self.root.glob("checkpoint-*")):
            meta_path = d / "meta.json"
            if not meta_path.exists():
                continue
            meta = json.loads(meta_path.read_text())
            value = meta["metrics"].get(self.monitor)
            if value is not None:
                self._kept.append((value, d))
        self._sort()

    def _sort(self):
        self._kept.sort(key=lambda t: t[0], reverse=(self.mode == "max"))

    def save(self, state, config, metrics: dict, epoch: int):
        value = float(metrics[self.monitor])
        name = f"checkpoint-epoch={epoch:03d}-{self.monitor}={value:.4f}"
        path = save_checkpoint(self.root / name, state, config, metrics,
                               extra={"epoch": epoch})
        self._kept.append((value, path))
        self._sort()
        while len(self._kept) > self.save_top_k:
            _, worst = self._kept.pop()
            shutil.rmtree(worst, ignore_errors=True)
        # always keep the most recent state for resume, independent of top-k
        save_checkpoint(self.root / "last", state, config, metrics,
                        extra={"epoch": epoch})
        return path

    @property
    def best(self) -> Path | None:
        return self._kept[0][1] if self._kept else None

    @property
    def latest(self) -> Path | None:
        if not self._kept:
            return None
        return max(
            self._kept,
            key=lambda t: json.loads((t[1] / "meta.json").read_text())["step"],
        )[1]
