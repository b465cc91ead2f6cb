"""Train-step roofline: where do the milliseconds of a 64^3 train step go?

Round-4 verdict #5: inference had a roofline verdict (tools/roofline.py);
training had none. This measures the bench train step (64^3, bench.py's
augment recipe) and an ablation ladder of sub-programs on the real chip:

  loss_only      jit forward + MultiBox loss                -> forward cost
  grad_only      jit value_and_grad (forward + backward)    -> backward = grad - loss
  no_augment     full step minus augmentation               -> optimizer = noaug - grad
  full           device augment + fwd + bwd + Adam          -> augment = full - noaug
  gathered       full step + device-resident index gather   -> gather = gathered - full

Each phase is timed like bench.measure (warmup, N iterations, ONE host
readback — block_until_ready under-reports on the tunneled runtime) and set
against analytic FLOP/byte costs (fwd MACs from tools/roofline.analytic;
bwd ~= 2x fwd FLOPs; Adam = 17 fp32 reads/writes per param incl. the m/v
moments and bias-group bookkeeping) to say whether each phase is
compute-tight, HBM-tight, or leaving time on the table.

Usage:  python tools/train_roofline.py [--batch 64] [--iters 30]
        [--out quality_artifacts/train_roofline.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0
TRAIN_VOLUME = (64, 64, 64)


def build_parts(batch: int, volume=TRAIN_VOLUME):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mslesions3d_tpu.data.augment import AugmentConfig
    from mslesions3d_tpu.models import SSD3D, SSD3DConfig, model_priors
    from mslesions3d_tpu.models.losses import multibox_loss_from_config
    from mslesions3d_tpu.train import create_train_state, make_train_step
    from mslesions3d_tpu.train.steps import make_gathered_train_step

    config = SSD3DConfig.create(
        n_classes=2, input_channels=1, input_size=volume,
        dtype="bfloat16", lr=1e-3, threshold=[0.1, 0.2], batch_size=batch,
    )
    model = SSD3D(config)
    priors = model_priors(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    augment = AugmentConfig(flip_axes=(0, 1, 2), rot90_planes=((1, 2),))

    rng = np.random.default_rng(0)
    d = volume[0]
    batch_data = {
        "image": jnp.asarray(rng.normal(0, 1, (batch, d, d, d, 1)).astype(np.float32)),
        "boxes": jnp.tile(jnp.asarray([[0.2, 0.2, 0.2, 0.5, 0.5, 0.5],
                                        [0.6, 0.6, 0.6, 0.8, 0.8, 0.8]],
                                       jnp.float32), (batch, 1, 1)),
        "labels": jnp.ones((batch, 2), jnp.int32),
        "box_mask": jnp.ones((batch, 2), bool),
        "batch_mask": jnp.ones((batch,), bool),
    }

    priors_j = jnp.asarray(priors)

    def loss_fn(params, batch_stats, data, rng_key):
        variables = {"params": params, "batch_stats": batch_stats}
        (locs, scores), _ = model.apply(
            variables, data["image"], train=True, mutable=["batch_stats"],
            rngs={"dropout": rng_key},
        )
        conf, loc = multibox_loss_from_config(
            config, locs, scores, data["boxes"], data["labels"],
            data["box_mask"], priors_j, batch_mask=data["batch_mask"],
        )
        return conf + config.alpha * loc

    loss_only = jax.jit(
        lambda st, data, k: loss_fn(st.params, st.batch_stats, data, k))
    grad_only = jax.jit(
        lambda st, data, k: jax.grad(loss_fn)(st.params, st.batch_stats, data, k))

    step_noaug = make_train_step(config, model, priors, augment=None, donate=False)
    step_full = make_train_step(config, model, priors, augment=augment, donate=False)

    # device-resident gather variant: dataset of 2*batch volumes, gather batch
    n = 2 * batch
    data_cache = {
        "image": jnp.asarray(rng.normal(0, 1, (n, d, d, d, 1)).astype(np.float32)),
        "boxes": jnp.tile(batch_data["boxes"][:1], (n, 1, 1)),
        "labels": jnp.ones((n, 2), jnp.int32),
        "box_mask": jnp.ones((n, 2), bool),
    }
    step_gathered = make_gathered_train_step(config, model, priors, augment,
                                             donate=False)
    idx = jnp.arange(batch, dtype=jnp.int32)

    def adam_only(st, grads):
        return st.apply_gradients(grads)

    adam_jit = jax.jit(adam_only)
    grads_example = grad_only(state, batch_data, jax.random.PRNGKey(1))

    # the dispatch-floor discriminator: 10 full steps inside ONE program
    # (lax.scan). If scan10/10 << full, the per-call numbers above measure
    # the host/tunnel dispatch floor, not device time — the regime the
    # epoch-scan Trainer loop was built for.
    body = make_train_step(config, model, priors, augment=augment,
                           donate=False, jit=False)
    SCAN_N = 10

    def scan10(st, rng):
        def one(carry, key):
            new_st, metrics = body(carry, batch_data, key)
            return new_st, metrics["total_loss"]

        keys = jax.random.split(rng, SCAN_N)
        final, losses = jax.lax.scan(one, st, keys)
        return losses

    scan10_jit = jax.jit(scan10)

    return {
        "config": config,
        "state": state,
        "batch": batch_data,
        "loss_only": lambda st, k: loss_only(st, batch_data, k),
        "grad_only": lambda st, k: grad_only(st, batch_data, k),
        "no_augment": lambda st, k: step_noaug(st, batch_data, k)[1]["total_loss"],
        "full": lambda st, k: step_full(st, batch_data, k)[1]["total_loss"],
        "gathered": lambda st, k: step_gathered(st, data_cache, idx, k)[1]["total_loss"],
        "adam_only": lambda st, k: adam_jit(st, grads_example).params,
        "scan10": lambda st, k: scan10_jit(st, k),
        "scan_n": SCAN_N,
        "n_params": sum(int(p.size) for p in
                        __import__("jax").tree_util.tree_leaves(state.params)),
    }


def timed(fn, state, iters: int) -> float:
    """Milliseconds per call, bench.measure-style (one end readback)."""
    import jax
    import numpy as np

    out = fn(state, jax.random.PRNGKey(0))
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + sync
    for i in range(3):
        out = fn(state, jax.random.fold_in(jax.random.PRNGKey(0), i))
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(state, jax.random.fold_in(jax.random.PRNGKey(0), 100 + i))
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) * 1000.0 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--volume", type=int, default=TRAIN_VOLUME[0],
                    help="cubic training volume edge (64 = bench config)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / "quality_artifacts"
                                         / "train_roofline.json"))
    args = ap.parse_args()

    from mslesions3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from roofline import analytic  # fwd-pass analytic model

    print(f"# device: {jax.devices()[0]}", flush=True)
    volume = (args.volume,) * 3
    parts = build_parts(args.batch, volume)
    state = parts["state"]

    ms = {}
    for name in ("loss_only", "grad_only", "no_augment", "full",
                 "gathered", "adam_only", "scan10"):
        print(f"# compiling/timing {name}...", flush=True)
        iters = max(3, args.iters // 5) if name == "scan10" else args.iters
        ms[name] = round(timed(parts[name], state, iters), 3)
        print(f"#   {name}: {ms[name]:.3f} ms", flush=True)

    # phase decomposition (ms per step)
    scan_n = parts["scan_n"]
    phases = {
        "forward_and_loss": ms["loss_only"],
        "backward": round(ms["grad_only"] - ms["loss_only"], 3),
        "optimizer_and_bookkeeping": round(ms["no_augment"] - ms["grad_only"], 3),
        "augmentation": round(ms["full"] - ms["no_augment"], 3),
        "device_gather": round(ms["gathered"] - ms["full"], 3),
        "optimizer_alone_crosscheck": ms["adam_only"],
        # device time of one full step with dispatch amortized over scan_n
        # in-program iterations; full - this = the per-call dispatch floor
        "full_step_in_scan": round(ms["scan10"] / scan_n, 3),
        "dispatch_floor": round(ms["full"] - ms["scan10"] / scan_n, 3),
    }

    # analytic positions (analytic returns (fwd FLOPs = 2*MACs, act bytes)
    # per volume)
    fwd_flops_per_vol, act_bytes_per_vol = analytic(volume=volume, bpl=2)
    fwd_flops = fwd_flops_per_vol * args.batch  # per step
    bwd_flops = 2.0 * fwd_flops                 # dgrad + wgrad
    n_params = parts["n_params"]
    # Adam fp32 traffic/step: read p,m,v,g + write p,m,v (7x4B) plus the
    # bias-group second pass bookkeeping -> ~8 floats/param
    adam_bytes = 8 * 4 * n_params
    vol_bytes = 4 * args.batch * args.volume ** 3  # one fp32 volume read (augment in)
    analysis = {
        "batch": args.batch,
        "n_params": n_params,
        "fwd_pct_bf16_peak": round(
            100 * fwd_flops / (ms["loss_only"] / 1e3) / (V5E_BF16_TFLOPS * 1e12), 2),
        "bwd_pct_bf16_peak": round(
            100 * bwd_flops / (max(phases["backward"], 1e-9) / 1e3)
            / (V5E_BF16_TFLOPS * 1e12), 2),
        "fwd_act_gbps_pct_hbm": round(
            100 * (act_bytes_per_vol * args.batch / (ms["loss_only"] / 1e3))
            / (V5E_HBM_GBPS * 1e9), 2),
        "adam_pct_hbm_peak": round(
            100 * (adam_bytes / (max(ms["adam_only"], 1e-9) / 1e3))
            / (V5E_HBM_GBPS * 1e9), 2),
        # a sub-0.05 ms (or negative) phase delta is timing noise on the
        # tunneled runtime — a percentage of it would be meaningless
        "augment_pct_hbm_peak": (
            round(100 * (3 * vol_bytes / (phases["augmentation"] / 1e3))
                  / (V5E_HBM_GBPS * 1e9), 2)
            if phases["augmentation"] > 0.05 else None),
        "step_pct_dispatch_floor": round(
            100 * phases["dispatch_floor"] / max(ms["full"], 1e-9), 1),
        "train_vps_per_call": round(1000 * args.batch / ms["full"], 1),
        "train_vps_in_scan": round(
            1000 * args.batch / max(phases["full_step_in_scan"], 1e-9), 1),
    }

    payload = {
        "volume": list(volume),
        "measured_ms": ms,
        "phases_ms": phases,
        "analysis": analysis,
        "device": str(jax.devices()[0]),
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "iters": args.iters,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
