"""Train an independent PyTorch mirror of the reference LSSD3D with the
reference recipe, to close the BASELINE north star "lesion F1 within 1% of
PyTorch reference" against a TRAINED torch model (round-2 verdict, missing
#1).

The reference itself (PyTorch Lightning + MONAI) cannot run in this
environment, so this script *is* the torch baseline: an NCDHW
MobileNet-SSD3D written from the documented reference schema (the same
mirror architecture the forward-parity test uses, tests/test_torch_import.py)
trained with the reference's exact recipe (reference lesions3d/train.py:128-188
and ssd3d.py:704-722):

  * Adam lr 1e-3, bias params at 2x lr, weight_decay 5e-4 (L2-in-grad);
  * CosineAnnealingLR T_max=40 stepped EVERY TRAINING STEP (ssd3d.py:527-529);
  * batch 8, 4000 steps, soft matching thresholds [0.1, 0.2);
  * MultiBox loss: L1 on positives + CE over all priors (mining disabled in
    the reference, ssd3d.py:926-933), normalized by total positives;
  * torch-default conv init (the reference's init() iterates children() and
    never sees a bare Conv3d — a no-op, ssd3d.py:79-84, so defaults ARE the
    reference behavior);
  * flip + rot90 augmentation, same distribution as the framework's device
    augmentation (rot90 planes first, then per-axis flips, p=0.5 each).

Data comes through the framework's own SyntheticDataModule so both sides
train on the identical materialized volumes and the identical 80/20 split
(seed 970205). The saved .ckpt is importable by cli.import_torch, after
which cli.predict + cli.eval score it with the same metrics pipeline as the
JAX model.

Usage:
  JAX_PLATFORMS=cpu python tools/parity_torch_train.py \
      -d .quality_runs/ci_64 --steps 4000 -o /tmp/parity/torch_mirror.ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # never grab the TPU tunnel
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import torch
import torch.nn as nn

CENTER_VARIANCE = 10.0
SIZE_VARIANCE = 5.0


# --------------------------------------------------------------------- model
def conv_bn(inp, oup, stride):
    return nn.Sequential(
        nn.Conv3d(inp, oup, 3, stride=stride, padding=1, bias=False),
        nn.BatchNorm3d(oup),
        nn.ReLU(inplace=True),
    )


class Block(nn.Module):
    def __init__(self, inp, oup, stride):
        super().__init__()
        self.conv1 = nn.Conv3d(inp, inp, 3, stride=stride, padding=1,
                               groups=inp, bias=False)
        self.bn1 = nn.BatchNorm3d(inp)
        self.conv2 = nn.Conv3d(inp, oup, 1, bias=False)
        self.bn2 = nn.BatchNorm3d(oup)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        return torch.relu(self.bn2(self.conv2(x)))


class TorchMirror(nn.Module):
    """Reference-schema NCDHW MobileNet-SSD3D (state_dict keys match
    cli.import_torch's expected layout)."""

    def __init__(self, layer_plan, feature_layers, channels_at, n_classes=2,
                 in_channels=1, boxes_per_location=2):
        super().__init__()
        feats = []
        cin = in_channels
        for entry in layer_plan:
            s = entry["strides"][0] if isinstance(entry["strides"], (tuple, list)) \
                else entry["strides"]
            if entry["kind"] == "conv_bn":
                feats.append(conv_bn(cin, entry["features"], s))
            else:
                feats.append(Block(cin, entry["features"], s))
            cin = entry["features"]
        self.base = nn.Module()
        self.base.features = nn.Sequential(*feats)

        self.feature_layers = tuple(sorted(feature_layers))
        self.pred_convs = nn.Module()
        self.pred_convs.loc_convs = nn.ModuleList(
            [nn.Conv3d(channels_at[l], boxes_per_location * 6, 3, padding=1)
             for l in self.feature_layers]
        )
        self.pred_convs.cl_convs = nn.ModuleList(
            [nn.Conv3d(channels_at[l], boxes_per_location * n_classes, 3, padding=1)
             for l in self.feature_layers]
        )
        self.n_classes = n_classes

    def forward(self, x):
        feats = {}
        out = x
        for i, f in enumerate(self.base.features):
            out = f(out)
            if i in self.feature_layers:
                feats[i] = out
        locs, scores = [], []
        for j, l in enumerate(self.feature_layers):
            lc = self.pred_convs.loc_convs[j](feats[l])
            lc = lc.permute(0, 2, 3, 4, 1).contiguous().view(x.shape[0], -1, 6)
            sc = self.pred_convs.cl_convs[j](feats[l])
            sc = sc.permute(0, 2, 3, 4, 1).contiguous().view(
                x.shape[0], -1, self.n_classes)
            locs.append(lc)
            scores.append(sc)
        return torch.cat(locs, 1), torch.cat(scores, 1)


# ------------------------------------------------------------ geometry/loss
def corner_to_center(b):
    return torch.cat([(b[..., 3:] + b[..., :3]) / 2, b[..., 3:] - b[..., :3]], -1)


def encode(cwhd, priors_cwhd):
    g_c = (cwhd[..., :3] - priors_cwhd[..., :3]) / (priors_cwhd[..., 3:] / CENTER_VARIANCE)
    g_s = torch.log(cwhd[..., 3:] / priors_cwhd[..., 3:]) * SIZE_VARIANCE
    return torch.cat([g_c, g_s], -1)


def pairwise_iou(a, b):
    lower = torch.maximum(a[:, None, :3], b[None, :, :3])
    upper = torch.minimum(a[:, None, 3:], b[None, :, 3:])
    dims = (upper - lower).clamp(min=0)
    inter = dims[..., 0] * dims[..., 1] * dims[..., 2]
    va = ((a[:, 3:] - a[:, :3]).prod(-1))[:, None]
    vb = ((b[:, 3:] - b[:, :3]).prod(-1))[None, :]
    return inter / (va + vb - inter)


def multibox_loss(pred_locs, pred_scores, gt_list, priors_corner, priors_center,
                  lo, hi, alpha=1.0):
    """gt_list: list of (boxes (n,6) corner, labels (n,)) per image.
    Semantics mirror reference MultiBoxLoss (ssd3d.py:741-941) = the
    framework's models/losses.py parity default."""
    B, P, _ = pred_locs.shape
    loc_targets = torch.zeros(B, P, 6)
    cls_targets = torch.zeros(B, P, dtype=torch.long)
    for i, (boxes, labels) in enumerate(gt_list):
        if boxes.shape[0] == 0:
            continue  # reference skips zero-object images (ssd3d.py:854-855)
        overlap = pairwise_iou(boxes, priors_corner)  # (M, P)
        object_for_prior = overlap.argmax(0)
        overlap_for_prior = overlap.max(0).values
        prior_for_object = overlap.argmax(1)
        # forced best-prior-per-object (torch scatter: last index wins)
        object_for_prior[prior_for_object] = torch.arange(boxes.shape[0])
        overlap_for_prior[prior_for_object] = 1.0
        label = labels[object_for_prior].clone()
        band = (overlap_for_prior >= lo) & (overlap_for_prior < hi)
        label[overlap_for_prior < lo] = 0
        label[band] = -1
        cls_targets[i] = label
        loc_targets[i] = encode(corner_to_center(boxes[object_for_prior]),
                                priors_center)

    positive = cls_targets > 0
    n_pos = positive.sum().clamp(min=1)
    diff = (pred_locs - loc_targets).abs()
    loc_loss = (diff * positive[..., None]).sum() / (n_pos * 6)
    ce = nn.functional.cross_entropy(
        pred_scores.reshape(-1, pred_scores.shape[-1]),
        cls_targets.clamp(min=0).reshape(-1), reduction="none",
    ).reshape(B, P)
    ce = torch.where(cls_targets < 0, torch.zeros(()), ce)
    conf_loss = ce.sum() / n_pos
    return conf_loss + alpha * loc_loss, conf_loss, loc_loss


# ------------------------------------------------------------- augmentation
def augment_batch(rng, images, gt_list, flip=True, rot90=True):
    """Per-sample flips + rot90, same distribution/order as the framework's
    AugmentConfig (rot90 planes (1,2),(0,1),(0,2) first, then flips over
    axes 0,1,2; p=0.5 each). images (B,D,H,W) numpy; boxes fractional
    corner-form with the inclusive-max-index convention (new = 1-old-1/S)."""
    out_imgs = []
    out_gt = []
    size = images.shape[1]
    inv = 1.0 / size
    for img, (boxes, labels) in zip(images, gt_list):
        boxes = boxes.copy()
        if rot90:
            for a, b in ((1, 2), (0, 1), (0, 2)):
                if rng.random() < 0.5:
                    img = np.rot90(img, 1, axes=(a, b))
                    lo_a, hi_a = boxes[:, a].copy(), boxes[:, a + 3].copy()
                    lo_b, hi_b = boxes[:, b].copy(), boxes[:, b + 3].copy()
                    boxes[:, a] = 1.0 - hi_b - inv
                    boxes[:, a + 3] = 1.0 - lo_b - inv
                    boxes[:, b] = lo_a
                    boxes[:, b + 3] = hi_a
        if flip:
            for ax in (0, 1, 2):
                if rng.random() < 0.5:
                    img = np.flip(img, axis=ax)
                    lo = boxes[:, ax].copy()
                    hi = boxes[:, ax + 3].copy()
                    boxes[:, ax] = 1.0 - hi - inv
                    boxes[:, ax + 3] = 1.0 - lo - inv
        out_imgs.append(np.ascontiguousarray(img))
        out_gt.append((torch.tensor(boxes), labels))
    return np.stack(out_imgs), out_gt


# -------------------------------------------------------------------- train
def main(argv=None):
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("-d", "--dataset_path", required=True)
    p.add_argument("-o", "--output", default="/tmp/parity/torch_mirror.ckpt")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("-b", "--batch_size", type=int, default=8)
    p.add_argument("-lr", "--learning_rate", type=float, default=1e-3)
    p.add_argument("-th", "--threshold", type=float, nargs="+", default=[0.1, 0.2])
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("-a", "--augmentations", nargs="*", default=["flip", "rotate90"])
    p.add_argument("-rs", "--seed", type=int, default=970205)
    p.add_argument("--log_every", type=int, default=100)
    args = p.parse_args(argv)

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)

    # Framework data + priors (jax stays on CPU)
    from mslesions3d_tpu.data.datasets import SyntheticDataModule
    from mslesions3d_tpu.models import SSD3DConfig, model_priors

    dm = SyntheticDataModule(args.dataset_path, n_classes=1,
                             batch_size=args.batch_size, random_state=args.seed)
    dm.setup("fit")
    data = dm.materialize(dm.trainsubs)
    images = data["image"][..., 0]  # (N, D, H, W) single-channel
    gt_all = []
    for i in range(images.shape[0]):
        m = data["box_mask"][i]
        gt_all.append((data["boxes"][i][m].astype(np.float32),
                       torch.tensor(data["labels"][i][m].astype(np.int64))))
    n_train = images.shape[0]
    input_size = images.shape[1:4]
    print(f"[parity-torch] {n_train} train volumes, input {input_size}", flush=True)

    config = SSD3DConfig.create(n_classes=2, input_channels=1,
                                input_size=tuple(input_size))
    priors_center = torch.tensor(np.asarray(model_priors(config)))
    pc = priors_center
    priors_corner = torch.cat([pc[:, :3] - pc[:, 3:] / 2,
                               pc[:, :3] + pc[:, 3:] / 2], -1)

    from mslesions3d_tpu.models.mobilenet import mobilenet_layer_plan

    layers = tuple(sorted(config.feature_layers))
    plan = mobilenet_layer_plan("mobilenet", 1.0, cube=True,
                                truncate_after=max(layers))
    channels_at = {i: e["features"] for i, e in enumerate(plan)}
    model = TorchMirror(plan, layers, channels_at, n_classes=2,
                        boxes_per_location=config.boxes_per_location)
    n_params = sum(q.numel() for q in model.parameters())
    print(f"[parity-torch] model: {len(plan)} layers, {n_params:,} params", flush=True)

    # reference optimizer: bias params 2x lr, Adam L2 5e-4 (ssd3d.py:704-722)
    biases = [q for n, q in model.named_parameters() if n.endswith(".bias")]
    others = [q for n, q in model.named_parameters() if not n.endswith(".bias")]
    opt = torch.optim.Adam(
        [{"params": biases, "lr": 2 * args.learning_rate}, {"params": others}],
        lr=args.learning_rate, weight_decay=5e-4,
    )
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=40)

    lo, hi = (args.threshold + [0.0])[:2]
    soft = len(args.threshold) > 1
    if not soft:
        hi = lo  # hard threshold: empty ignore band
    do_flip = "flip" in args.augmentations
    do_rot = any(a.startswith("rotate90") for a in args.augmentations)

    steps_per_epoch = n_train // args.batch_size
    rng_aug = np.random.default_rng(args.seed + 1)
    model.train()
    t0 = time.time()
    step = 0
    epoch = 0
    history = []
    while step < args.steps:
        order = np.arange(n_train)
        np.random.default_rng(args.seed + epoch).shuffle(order)
        for bi in range(steps_per_epoch):
            idx = order[bi * args.batch_size:(bi + 1) * args.batch_size]
            imgs = images[idx]
            gts = [gt_all[i] for i in idx]
            gts = [(b, l) for b, l in ((torch.tensor(x[0]), x[1]) for x in gts)]
            if do_flip or do_rot:
                imgs, gts = augment_batch(
                    rng_aug, imgs, [(b.numpy(), l) for b, l in gts],
                    flip=do_flip, rot90=do_rot)
            x = torch.tensor(imgs[:, None]).float()  # (B,1,D,H,W)
            locs, scores = model(x)
            total, conf, loc = multibox_loss(
                locs, scores, gts, priors_corner, priors_center, lo, hi,
                alpha=args.alpha)
            opt.zero_grad()
            total.backward()
            opt.step()
            sched.step()  # per-step, reference ssd3d.py:527-529
            step += 1
            if step % args.log_every == 0 or step == args.steps:
                dt = time.time() - t0
                print(f"[step {step:5d}] loss={total.item():.4f} "
                      f"(conf {conf.item():.4f} loc {loc.item():.4f}) "
                      f"lr={sched.get_last_lr()[1]:.2e} {dt:.0f}s", flush=True)
                history.append({"step": step, "loss": float(total.item())})
            if step >= args.steps:
                break
        epoch += 1

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    torch.save({"state_dict": model.state_dict()}, out)
    (out.parent / "history.json").write_text(json.dumps({
        "args": vars(args), "history": history,
        "wall_sec": round(time.time() - t0, 1),
    }))
    print(f"[parity-torch] saved {out} after {step} steps "
          f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
