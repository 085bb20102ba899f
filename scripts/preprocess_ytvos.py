"""Offline YouTube-VOS 480p preprocessing
(re-design of /root/reference/datasets/preprocess/preprocess_ytvos.py:12-81).

Resizes the train split's JPEGs (bicubic) and annotation PNGs (nearest,
palette preserved) to a 480-pixel short side into ``train_480p/``.

    python scripts/preprocess_ytvos.py --root /data/YTVOS19 --workers 8
"""

from __future__ import annotations

import argparse
import os
from multiprocessing import Pool

from PIL import Image


def _resize_pair(args):
    from swem_tpu.data.transforms import resize_short_side

    src, dst, is_mask = args
    img = Image.open(src)
    img.load()
    img = resize_short_side(img, 480, Image.NEAREST if is_mask else Image.BICUBIC)
    img.save(dst)


def collect_jobs(root: str):
    jobs = []
    for sub, is_mask in (("JPEGImages", False), ("Annotations", True)):
        src_root = os.path.join(root, "train", sub)
        dst_root = os.path.join(root, "train_480p", sub)
        for vid in sorted(os.listdir(src_root)):
            os.makedirs(os.path.join(dst_root, vid), exist_ok=True)
            for fn in os.listdir(os.path.join(src_root, vid)):
                jobs.append((
                    os.path.join(src_root, vid, fn),
                    os.path.join(dst_root, vid, fn),
                    is_mask,
                ))
    return jobs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True, help="YTVOS root containing train/")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()
    jobs = collect_jobs(args.root)
    print(f"resizing {len(jobs)} files -> {args.root}/train_480p")
    with Pool(args.workers) as pool:
        pool.map(_resize_pair, jobs)


if __name__ == "__main__":
    main()
