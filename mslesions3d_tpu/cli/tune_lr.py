"""LR finder: exponential learning-rate sweep with loss tracking.

Parity target: reference tune_lr() (lesions3d/train.py:94-118), which wraps
Lightning's auto_lr_find. Here: sweep lr geometrically from lr_min to lr_max
over n_steps single batches, record the (smoothed) loss per lr, and suggest
the lr at the steepest descent point (the standard Leslie-Smith heuristic).
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from ..data.datasets import SyntheticDataModule
from ..models.losses import multibox_loss_from_config
from ..models.ssd3d import SSD3D, SSD3DConfig, model_priors
from ..train.loop import array_batch
from ..train.state import create_train_state


def lr_find(config: SSD3DConfig, datamodule, lr_min=1e-6, lr_max=1.0, n_steps=60,
            smoothing=0.8, seed=0):
    model = SSD3D(config)
    priors = jax.numpy.asarray(model_priors(config))
    state = create_train_state(model, config, jax.random.PRNGKey(seed))

    lrs = np.geomspace(lr_min, lr_max, n_steps)

    # plain SGD with lr as a traced scalar: ONE compile for the whole sweep
    @jax.jit
    def step(params, batch_stats, lr, batch, rng):
        def loss_fn(p):
            (locs, scores), mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            conf, loc = multibox_loss_from_config(
                config, locs, scores, batch["boxes"], batch["labels"],
                batch["box_mask"], priors,
            )
            return conf + config.alpha * loc, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return new_params, new_stats, loss

    params, batch_stats = state.params, state.batch_stats
    history = []
    smoothed = None
    batches = datamodule.train_batches(epoch=0, drop_partial=False)
    batch_cache = [array_batch(b) for b in batches]
    rng = jax.random.PRNGKey(seed)

    for i, lr in enumerate(lrs):
        batch = batch_cache[i % len(batch_cache)]
        rng, sub = jax.random.split(rng)
        params, batch_stats, loss = step(
            params, batch_stats, jax.numpy.asarray(lr, jax.numpy.float32), batch, sub
        )
        loss = float(loss)
        if not np.isfinite(loss):
            history.append({"lr": float(lr), "loss": float("inf")})
            break
        smoothed = loss if smoothed is None else smoothing * smoothed + (1 - smoothing) * loss
        history.append({"lr": float(lr), "loss": loss, "smoothed": smoothed})
        if smoothed > 4 * min(h.get("smoothed", np.inf) for h in history):
            break  # diverged

    finite = [h for h in history if np.isfinite(h["loss"]) and "smoothed" in h]
    if len(finite) < 3:
        suggestion = lr_min
    else:
        losses = np.array([h["smoothed"] for h in finite])
        grads_ = np.gradient(losses)
        suggestion = finite[int(np.argmin(grads_))]["lr"]
    return suggestion, history


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("-d", "--dataset_path", type=str, required=True)
    p.add_argument("-dn", "--dataset_name", type=str, default=None)
    p.add_argument("--n_classes", type=int, default=1)
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("-wm", "--width_mult", type=float, default=1.0)
    p.add_argument("-n", "--n_steps", type=int, default=60)
    p.add_argument("--lr_min", type=float, default=1e-6)
    p.add_argument("--lr_max", type=float, default=1.0)
    p.add_argument("-o", "--output", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    dm = SyntheticDataModule(
        data_dir=args.dataset_path, dataset_name=args.dataset_name,
        n_classes=args.n_classes, batch_size=args.batch_size, cache=True,
    )
    dm.setup("fit")
    input_size = dm.get_sample(dm.trainsubs[0])["img"].shape[:3]
    config = SSD3DConfig.create(
        n_classes=args.n_classes + 1, input_channels=1,
        input_size=tuple(input_size), width_mult=args.width_mult,
        threshold=[0.1, 0.2],
    )
    suggestion, history = lr_find(
        config, dm, args.lr_min, args.lr_max, args.n_steps,
    )
    print(f"[tune_lr] suggested learning rate: {suggestion:.2e}")
    if args.output:
        with open(args.output, "w") as f:
            json.dump({"suggestion": suggestion, "history": history}, f, indent=2)
    return suggestion


if __name__ == "__main__":
    main()
