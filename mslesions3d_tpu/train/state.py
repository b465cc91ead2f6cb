"""Train state and optimizer replicating the reference's training dynamics.

Parity targets (lesions3d/ssd3d.py:704-722, 527-529):
* Adam with L2 weight decay 5e-4 applied to the gradient (torch-Adam
  semantics: g' = g + wd * p, NOT decoupled AdamW);
* bias parameters get 2x the learning rate (param groups by name suffix);
* CosineAnnealingLR with T_max=40 stepped EVERY STEP (the reference quirk:
  the schedule oscillates with period 80 steps), eta_min = 0.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # consecutive non-finite-loss steps, carried ON DEVICE so the training
    # loop never has to sync per step just to watch for divergence; the host
    # checks it on the (much coarser) logging cadence
    nonfinite_streak: jnp.ndarray
    # exponential moving average of params (None when config.ema_decay == 0);
    # updated inside the train step, scored by validation/predict
    ema_params: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=self.batch_stats if new_batch_stats is None else new_batch_stats,
        )


def eval_view(state: TrainState) -> TrainState:
    """The state validation/predict should score: EMA params when carried.

    Identity when EMA is off. The training forward keeps using the raw
    params — only scoring (val loss, detection metrics, checkpoint
    selection, predict) sees the average.
    """
    if state.ema_params is None:
        return state
    return state.replace(params=state.ema_params)


def cosine_annealing_schedule(base_lr: float, t_max: int = 40, eta_min: float = 0.0):
    """torch CosineAnnealingLR closed form; periodic when stepped past T_max."""

    def schedule(step):
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * step / t_max)) / 2

    return schedule


def _is_bias(path) -> bool:
    return path[-1].key == "bias"


def make_optimizer(lr: float, scheduler: str = "CosineAnnealingLR",
                   weight_decay: float = 5e-4, t_max: int = 40):
    """Adam + L2 decay with a 2x-lr bias group and per-step cosine schedule.

    Schedulers:
      CosineAnnealingLR  torch parity — per-step cosine with period t_max
                         (default 40); past t_max it OSCILLATES forever
                         (reference ssd3d.py:527-529,719), never annealing.
      cosine_annealed    framework extension — one half-cosine over t_max
                         steps then held at eta_min (a real decay; set
                         t_max = total training steps). The train CLI
                         defaults t_max to max_iterations for this mode.
      none               constant lr.
    """
    if scheduler == "CosineAnnealingLR":
        base_schedule = cosine_annealing_schedule(lr, t_max)
    elif scheduler == "cosine_annealed":
        periodic = cosine_annealing_schedule(lr, t_max)
        base_schedule = lambda step: periodic(jnp.minimum(step, t_max))
    elif scheduler == "none":
        base_schedule = lambda step: jnp.asarray(lr)
    else:
        raise ValueError(f"Unknown scheduler {scheduler!r}")

    def adam_chain(mult):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_schedule(lambda s: -mult * base_schedule(s)),
        )

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "bias" if _is_bias(path) else "weight", params
        )

    tx = optax.multi_transform(
        {"bias": adam_chain(2.0), "weight": adam_chain(1.0)}, label_fn
    )
    return tx, base_schedule


def kaiming_init_overrides(params, rng):
    """Legacy init override: relu-gain Kaiming-uniform kernels + zero biases.

    Historical note: this was written on the assumption that the reference's
    ``init()`` (ssd3d.py:462-465, 80-84, 137-141) re-initializes convs with
    kaiming_uniform. Closer reading shows that init() iterates
    ``children()`` — which are Sequential/ModuleList containers, never bare
    Conv3d — so it is a NO-OP and torch *constructor defaults* are the real
    reference init (kaiming_uniform(a=sqrt(5)) kernels + uniform-band
    biases; now implemented natively as ``SSD3DConfig.init_scheme="torch"``,
    models/layers.py). The trained-parity study (QUALITY.md) measured this
    override ~0.11 best-F1 BELOW torch defaults at the reference recipe.
    Kept as ``init_scheme="kaiming_relu"`` so rounds-1/2 runs stay
    reproducible; bound here = sqrt(6 / fan_in) (relu gain), biases zeroed.
    """

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(rng, len(flat))
    new_leaves = []
    for (path, leaf), key in zip(flat, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and leaf.ndim >= 2:
            fan_in = 1
            for d in leaf.shape[:-1]:
                fan_in *= d
            gain = jnp.sqrt(2.0)  # relu gain (kaiming default nonlinearity)
            bound = gain * jnp.sqrt(3.0 / fan_in)
            new_leaves.append(jax.random.uniform(key, leaf.shape, leaf.dtype, -bound, bound))
        elif name == "bias":
            new_leaves.append(jnp.zeros_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def create_train_state(model, config, rng, kaiming: bool | None = None) -> TrainState:
    """Initialize model variables + optimizer for an SSD3DConfig.

    Init follows ``config.init_scheme``: "torch" (default) and "flax" are
    produced directly by ``model.init`` (models/layers.py initializers);
    "kaiming_relu" applies the legacy post-init override on top (the
    rounds-1/2 training default — see kaiming_init_overrides). ``kaiming``
    forces the override on/off explicitly (False is used by checkpoint
    loaders where init values are irrelevant).
    """
    d, h, w = config.input_size
    dummy = jnp.zeros((1, d, h, w, config.input_channels), jnp.float32)
    init_rng, kaiming_rng, dropout_rng = jax.random.split(rng, 3)
    # NOTE: deliberately EAGER (not jax.jit-wrapped). A jitted init is a
    # large multi-output program whose PERSISTENT-CACHE-DESERIALIZED
    # executable can corrupt the process heap on the forced-8-device CPU
    # backend (BUGS.md bug D; jax 0.9.0) — round 5 isolated the trigger to
    # executing cache-deserialized executables of susceptible programs, not
    # donation and not init outputs specifically (utils/cache.py::
    # quarantine_from_persistent_cache has the full story + measurements).
    # Eager init sidesteps the class entirely and has been stable across all
    # rounds; its per-initializer programs (jit__uniform etc.) deserialize
    # safely (10 cache hits per process, thousands of clean runs).
    variables = model.init({"params": init_rng, "dropout": dropout_rng}, dummy, train=False)
    params = variables["params"]
    if kaiming is None:
        kaiming = getattr(config, "init_scheme", "torch") == "kaiming_relu"
    if kaiming:
        params = kaiming_init_overrides(params, kaiming_rng)
    # plain dict, matching what the train step's mutable apply hands back —
    # a FrozenDict({}) here breaks the skip_nonfinite tree merge for BN-less
    # models (convnet backbone)
    from flax.core import unfreeze

    batch_stats = unfreeze(variables.get("batch_stats", {}))

    tx, _ = make_optimizer(config.lr, config.scheduler, t_max=config.t_max)
    opt_state = tx.init(params)
    ema_decay = float(getattr(config, "ema_decay", 0.0))
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        nonfinite_streak=jnp.asarray(0, jnp.int32),
        # seed EMA = init params (no zero-init bias; the average is exact
        # from step 1 without torch-style warmup corrections)
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema_decay > 0 else None,
        tx=tx,
    )
