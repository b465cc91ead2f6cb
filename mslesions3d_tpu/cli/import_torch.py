"""Import a reference PyTorch LSSD3D checkpoint as a framework checkpoint.

Usage:
  python -m mslesions3d_tpu.cli.import_torch -m ref.ckpt -o ./converted \
      --input_size 64 64 64 [-pl "3 5 7"] [...]

Loads the torch state_dict (Lightning .ckpt or bare), converts it with
train.torch_import (NCDHW -> NDHWC kernel transposes, BN stats), grafts it
into a freshly initialized SSD3D state, and writes a standard checkpoint dir
usable by cli.predict / cli.eval — so models trained with the reference can
be served on TPU directly.
"""

from __future__ import annotations

import argparse

import jax

from ..models.ssd3d import SSD3D, SSD3DConfig
from ..train.checkpoints import save_checkpoint
from ..train.state import create_train_state
from ..train.torch_import import import_torch_checkpoint


def main(argv=None):
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("-m", "--model_path", type=str, required=True,
                   help="torch .ckpt / .pt path")
    p.add_argument("-o", "--output_dir", type=str, required=True,
                   help="framework checkpoint directory to write")
    p.add_argument("--n_classes", type=int, default=2,
                   help="including background (reference n_classes+1)")
    p.add_argument("--input_channels", type=int, default=1)
    p.add_argument("--input_size", type=int, nargs=3, default=[64, 64, 64])
    p.add_argument("-pl", "--prediction_layers", type=str, default="3 5 7")
    p.add_argument("-bpl", "--boxes_per_location", type=int, default=2)
    p.add_argument("-wm", "--width_mult", type=float, default=1.0)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    layers = [int(x) for x in args.prediction_layers.split()]
    config = SSD3DConfig.create(
        n_classes=args.n_classes,
        input_channels=args.input_channels,
        input_size=tuple(args.input_size),
        aspect_ratios={l: [1.0] for l in layers},
        boxes_per_location=args.boxes_per_location,
        width_mult=args.width_mult,
    )

    params, batch_stats = import_torch_checkpoint(args.model_path, config)

    model = SSD3D(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0), kaiming=False)
    merged = dict(state.params)
    merged["backbone"] = params["backbone"]
    merged["heads"] = params["heads"]
    if "rescale_factors" in params:
        merged["rescale_factors"] = params["rescale_factors"]
    state = state.replace(params=merged, batch_stats=batch_stats)

    path = save_checkpoint(args.output_dir, state, config,
                           metrics={"avg_val_loss": float("nan")},
                           extra={"imported_from": args.model_path})
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(merged))
    print(f"[import_torch] wrote {path} ({n_params:,} parameters)")
    return path


if __name__ == "__main__":
    main()
