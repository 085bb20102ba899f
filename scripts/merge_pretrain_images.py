"""Merge the five static pretraining datasets into the STCN_PreTrain layout
(re-design of /root/reference/datasets/preprocess/copy_images.py:10-58).

Expected inputs (as distributed by their authors):
    BIG_small/ HRSOD_small/ {im,gt} pairs; FSS-1000 class dirs; ECSSD
    images/ground_truth_mask; DUTS-TR Image/Mask.

Output layout consumed by StaticTrainDataset:
    <out>/JPEGImages/<name>/*.jpg|png   <out>/Annotations/<name>/*.png
"""

from __future__ import annotations

import argparse
import os
import shutil
from glob import glob


def _copy_pairs(imgs, msks, out_root, name):
    if len(imgs) != len(msks):
        raise ValueError(f"{name}: {len(imgs)} images vs {len(msks)} masks")
    for im, mk in zip(imgs, msks):
        stem_i = os.path.splitext(os.path.basename(im))[0]
        stem_m = os.path.splitext(os.path.basename(mk))[0]
        if stem_i != stem_m:
            raise ValueError(f"{name}: mispaired {im} vs {mk}")
    img_dir = os.path.join(out_root, "JPEGImages", name)
    msk_dir = os.path.join(out_root, "Annotations", name)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(msk_dir, exist_ok=True)
    for i, (im, mk) in enumerate(zip(imgs, msks)):
        base = f"{name}_{i:06d}"
        shutil.copy(im, os.path.join(img_dir, base + os.path.splitext(im)[1]))
        shutil.copy(mk, os.path.join(msk_dir, base + ".png"))
    print(f"{name}: {len(imgs)} pairs")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--big", help="BIG_small root (im/ gt/)")
    p.add_argument("--hrsod", help="HRSOD_small root (im/ gt/)")
    p.add_argument("--fss", help="FSS-1000 root (class dirs)")
    p.add_argument("--ecssd", help="ECSSD root (images/ ground_truth_mask/)")
    p.add_argument("--duts", help="DUTS-TR root (DUTS-TR-Image/ DUTS-TR-Mask/)")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    if args.big:
        _copy_pairs(sorted(glob(f"{args.big}/im/*")), sorted(glob(f"{args.big}/gt/*")),
                    args.out, "BIG_small")
    if args.hrsod:
        _copy_pairs(sorted(glob(f"{args.hrsod}/im/*")), sorted(glob(f"{args.hrsod}/gt/*")),
                    args.out, "HRSOD_small")
    if args.fss:
        imgs, msks = [], []
        for cls in sorted(os.listdir(args.fss)):
            for jpg in sorted(glob(os.path.join(args.fss, cls, "*.jpg"))):
                png = jpg[:-4] + ".png"
                if os.path.exists(png):
                    imgs.append(jpg)
                    msks.append(png)
        _copy_pairs(imgs, msks, args.out, "FSS")
    if args.ecssd:
        _copy_pairs(sorted(glob(f"{args.ecssd}/images/*.jpg")),
                    sorted(glob(f"{args.ecssd}/ground_truth_mask/*.png")),
                    args.out, "ECSSD")
    if args.duts:
        _copy_pairs(sorted(glob(f"{args.duts}/DUTS-TR-Image/*.jpg")),
                    sorted(glob(f"{args.duts}/DUTS-TR-Mask/*.png")),
                    args.out, "DUTS")


if __name__ == "__main__":
    main()
