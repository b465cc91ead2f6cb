"""Serve detections from a hermetic .mslx bundle — no checkpoint, no model code.

Completes the deployment story (serving.py): ``msl-export`` writes the
bundle; this CLI is the consumer a clinical pipeline would run — it loads
NIfTI volume(s), normalizes like training did, calls the AOT artifact, and
writes detections as JSON (fractional + voxel boxes, labels, scores). The
reference has no equivalent (serving there means re-running the Lightning
predict loop from a Python checkpoint, reference predict.py:235-281).

    msl-serve -m model.mslx -i sub-01_image.nii.gz -o out/
    msl-serve -m full.mslx -i vol1.nii.gz vol2.nii.gz -o out/   # batches
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model_path", required=True, help=".mslx bundle")
    p.add_argument("-i", "--inputs", nargs="+", required=True,
                   help="NIfTI volume path(s)")
    p.add_argument("-o", "--output_dir", required=True)
    p.add_argument("--normalize", type=int, default=1,
                   help="nonzero-mean/std normalize per volume (the training "
                        "pipeline's normalization; 0 = raw intensities)")
    p.add_argument("--platform", default=None,
                   help="jax platform override (e.g. cpu)")
    return p


def _normalize(img: np.ndarray) -> np.ndarray:
    nz = img != 0
    if not nz.any():
        return img
    mean = img[nz].mean()
    std = img[nz].std() or 1.0
    out = img.copy()
    out[nz] = (img[nz] - mean) / std
    return out


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ..data.nifti import load_nifti
    from ..serving import ServingDetector

    det = ServingDetector(args.model_path)
    expected = tuple(det.manifest["input"]["shape"][1:4])
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    volumes, names = [], []
    for path in args.inputs:
        img = load_nifti(path).data.astype(np.float32)
        if args.normalize:
            img = _normalize(img)
        if img.ndim == 3:
            img = img[..., None]
        if img.shape[:3] != expected:
            raise SystemExit(
                f"{path}: volume {img.shape[:3]} does not match the bundle's "
                f"input {expected} — export with the right shape "
                f"(-sw D H W for full volumes) or resample first"
            )
        volumes.append(img)
        names.append(Path(path).name.split(".")[0])

    res = det.predict(np.stack(volumes))
    vol = np.asarray(expected, np.float32)
    for i, name in enumerate(names):
        n = int(res["count"][i])
        frac = res["boxes"][i][:n]
        record = {
            "input": args.inputs[i],
            "bundle": str(args.model_path),
            "detections": [
                {
                    "box_frac": [float(x) for x in frac[j]],
                    "box_voxels": [float(x) for x in
                                   (frac[j] * np.concatenate([vol, vol]))],
                    "label": int(res["labels"][i][j]),
                    "score": float(res["scores"][i][j]),
                }
                for j in range(n)
            ],
        }
        out = out_dir / f"{name}_detections.json"
        out.write_text(json.dumps(record, indent=2))
        print(f"[serve] {name}: {n} detections -> {out}", flush=True)
    return out_dir


if __name__ == "__main__":
    main()
