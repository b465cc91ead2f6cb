"""Measure the fused Pallas deep-tail kernel against the XLA block chain.

Round-3 verdict weak #3 / QUALITY.md roofline: at the 96^3 flagship
geometry, every backbone stage past layer_3 runs on feature maps of
12^3 x 128 and smaller — per-conv dispatch latency + HBM round-trips
dominate the math there. ``kernels/tail.py`` fuses layers 4..7 (dw 3^3 +
folded BN + ReLU + pointwise + folded BN + ReLU, strides 2/1/2/1) into one
VMEM-resident Pallas program emitting the two wanted feature maps
(layer_5: 6^3 x 256, layer_7: 3^3 x 512).

This script measures BOTH views on the real chip:

  1. tail-only latency: the fused program vs the equivalent XLA conv chain
     on identical folded weights, K dependent iterations inside one jit
     (scalar 1e-12 feedback so XLA cannot fold the chain; see the axon
     timing notes in kernels/nms.py — block_until_ready under-reports, so
     timing uses a host readback).
  2. end-to-end: full-model inference (backbone + heads + decode/NMS) at
     the headline geometry with use_pallas_tail off vs on (same numbers
     bench.py's infer_b128 / infer_b128_tail sections record).

Writes ``.quality_runs/tail_story.json`` and prints a table. Run on the
real TPU (no platform forcing); a dead axon tunnel is detected by a
subprocess probe first.

Usage: python tools/tail_story.py [--batches 8 32 128] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def probe(timeout_sec: float = 90.0) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_sec, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def synth_tail_layers(rng):
    """Folded weights for the flagship tail (layers 4..7 of the 96^3 plan)."""
    import jax.numpy as jnp

    def mk(cin, cout, stride, seed):
        import numpy as np

        r = np.random.default_rng(seed)
        return dict(
            dw_w=jnp.asarray(r.normal(0, 0.2, (3, 3, 3, cin)).astype("float32")),
            dw_gamma=r.normal(1, 0.1, (cin,)).astype("float32"),
            dw_beta=r.normal(0, 0.1, (cin,)).astype("float32"),
            pw_w=jnp.asarray(r.normal(0, 0.1, (cin, cout)).astype("float32")),
            pw_gamma=r.normal(1, 0.1, (cout,)).astype("float32"),
            pw_beta=r.normal(0, 0.1, (cout,)).astype("float32"),
            stride=stride,
        )

    return [mk(128, 256, 2, rng), mk(256, 256, 1, rng + 1),
            mk(256, 512, 2, rng + 2), mk(512, 512, 1, rng + 3)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[8, 32, 128])
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--chain", type=int, default=20,
                   help="dependent tail iterations inside one jit")
    args = p.parse_args()

    if not probe():
        print("TPU tunnel unreachable; aborting (re-run when .tpu_alive is fresh)")
        return 1

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mslesions3d_tpu.kernels.tail import fused_tail
    from mslesions3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    results = {"device": str(jax.devices()[0]), "batches": {}}

    def blockwise(x, layers):
        outs = []
        for L in layers:
            cin = L["dw_w"].shape[-1]
            y = jax.lax.conv_general_dilated(
                x, L["dw_w"].reshape(3, 3, 3, 1, cin).astype(x.dtype),
                (L["stride"],) * 3, ((1, 1), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=cin)
            y = jnp.maximum(
                y.astype(jnp.float32) * L["dw_gamma"] + L["dw_beta"], 0
            ).astype(x.dtype)
            z = jax.lax.dot_general(
                y, L["pw_w"].astype(x.dtype), (((4,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            x = jnp.maximum(z * L["pw_gamma"] + L["pw_beta"], 0).astype(x.dtype)
            outs.append(x)
        return outs[1], outs[3]

    layers = synth_tail_layers(0)

    for b in args.batches:
        x0 = jnp.asarray(
            np.random.default_rng(0).normal(0, 1, (b, 12, 12, 12, 128)),
            jnp.bfloat16)
        row = {}

        def chained(fn):
            # K dependent tail evaluations; scalar feedback keeps shape and
            # defeats constant folding without perturbing magnitudes
            def run(x):
                def body(_, x):
                    f5, f7 = fn(x, layers)
                    return x * (1.0 + 1e-12 * jnp.mean(f7).astype(x.dtype))
                return jax.lax.fori_loop(0, args.chain, body, x)
            return jax.jit(run)

        for name, fn in (
            ("xla_chain", blockwise),
            ("fused", lambda x, L: tuple(fused_tail(x, L, emit=(1, 3)))),
        ):
            g = chained(fn)
            print(f"# compiling tail-only {name} b{b}...", flush=True)
            np.asarray(g(x0))
            t0 = time.perf_counter()
            np.asarray(g(x0))
            dt = time.perf_counter() - t0
            per_call_us = dt / args.chain * 1e6
            row[f"tail_{name}_us_per_call"] = round(per_call_us, 1)
            print(f"  b{b} {name}: {per_call_us:.1f} us/tail-pass", flush=True)

        results["batches"][b] = row

    # end-to-end A/B via bench.measure (same build path as the driver bench)
    import bench

    bench._late_imports()
    e2e = {}
    for b in args.batches:
        for tail in (False, True):
            vps = bench.measure(b, iters=args.iters, use_pallas_tail=tail)
            key = f"e2e_b{b}_{'fused' if tail else 'xla'}_vps"
            e2e[key] = round(vps, 2)
            print(f"# {key}: {vps:.2f} volumes/sec", flush=True)
    results["end_to_end"] = e2e

    out = REPO / ".quality_runs" / "tail_story.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
