"""Input-pipeline throughput benchmark: can the loader feed the TPU?

The train step is ~116.5 ms for a global batch of 8 (PARITY.md), so one
chip consumes ~69 samples/s; a data-parallel pod multiplies that. This
script measures what the host-side pipeline (`data/loader.py::TrainLoader`)
actually delivers and where each millisecond goes:

* **per-op breakdown** — the REAL `sample()` path is instrumented by
  wrapping the transform/decode/TPS/synthesis entry points with timing
  accumulators (no re-implementation that could drift from the pipeline):
  jpeg/png decode, resized-crop, affine, color-jitter, grayscale, crop/
  resize, TPS warp, pseudo-video synthesis (stage 0), finalize packing.
* **steady-state loader samples/s** — `TrainLoader` end to end, for
  `num_workers=0` (pure in-process per-sample cost) and small spawn pools
  (pool overhead; on a 1-core box >=1 workers only shows overhead, the
  scaling itself needs a multi-core host).
* **cores-needed conclusion** — target samples/s (bs / step_ms) divided by
  the measured per-core rate.

With no ``--data_root`` it synthesizes DAVIS-shaped 480p videos and
FSS-shaped static images in a temp dir (decode cost is real: actual JPEG/
palette-PNG files at 480p); point ``--data_root`` at a real tree to
measure production numbers on a TPU host.

Reference pipeline being budgeted: /root/reference/datasets/
dataloader.py:12-36 (NUM_WORKERS torch loader), video_dataset.py:231-359.

Recorded results (this 1-core dev VM, 2026-08-20, synthetic 480p trees):
see PARITY.md "Input pipeline".
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import tempfile
import time
from collections import defaultdict

import numpy as np
from PIL import Image

from swem_tpu.data import transforms as T
from swem_tpu.data import static_dataset as sd
from swem_tpu.data import video_dataset as vd
from swem_tpu.data.loader import TrainLoader, sample_with_rng
from swem_tpu.data.palette import davis_palette, save_seg_mask

# --------------------------------------------------------------------- #
# synthetic data trees (real JPEG/PNG files so decode cost is real)


def build_video_tree(root, n_videos=6, n_frames=12, size=(480, 854)):
    rng = np.random.default_rng(0)
    pal = davis_palette()
    h, w = size
    for i in range(n_videos):
        jdir = os.path.join(root, "JPEGImages", "480p", f"video{i}")
        adir = os.path.join(root, "Annotations", "480p", f"video{i}")
        os.makedirs(jdir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        # smooth-ish content so JPEG size (and decode cost) is photo-like,
        # not noise-inflated
        base = (rng.random((h // 8, w // 8, 3)) * 255).astype(np.uint8)
        img = np.asarray(Image.fromarray(base).resize((w, h), Image.BICUBIC))
        for t in range(n_frames):
            fr = np.clip(img.astype(np.int16) + int(rng.integers(-8, 8)),
                         0, 255).astype(np.uint8)
            Image.fromarray(fr).save(os.path.join(jdir, f"{t:05d}.jpg"),
                                     quality=90)
            lab = np.zeros((h, w), np.uint8)
            lab[100:250, 100 + 3 * t:300 + 3 * t] = 1
            lab[260:420, 480:800] = 2
            save_seg_mask(lab, os.path.join(adir, f"{t:05d}.png"), pal)


def build_static_tree(root, n=24, size=(480, 640)):
    rng = np.random.default_rng(1)
    pal = davis_palette()
    h, w = size
    jdir = os.path.join(root, "JPEGImages", "FSS")
    adir = os.path.join(root, "Annotations", "FSS")
    os.makedirs(jdir, exist_ok=True)
    os.makedirs(adir, exist_ok=True)
    for i in range(n):
        base = (rng.random((h // 8, w // 8, 3)) * 255).astype(np.uint8)
        img = np.asarray(Image.fromarray(base).resize((w, h), Image.BICUBIC))
        Image.fromarray(img).save(os.path.join(jdir, f"im{i}.jpg"), quality=90)
        lab = np.zeros((h, w), np.uint8)
        lab[h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 1
        save_seg_mask(lab, os.path.join(adir, f"im{i}.png"), pal)


def make_video_dataset(root, crop):
    return vd.VideoTrainDataset("DAVIS17", root, num_frames=3, max_objs=2,
                                crop_size=(crop, crop), max_iter=150000)


def make_static_dataset(root, crop):
    return sd.StaticTrainDataset(root, datasets=("FSS",), ratios=(1,),
                                 num_frames=3, max_objs=2,
                                 crop_size=(crop, crop))


# --------------------------------------------------------------------- #
# per-op instrumentation of the real sample() path


class OpTimer:
    """Wraps pipeline entry points with timing accumulators.

    Buckets are non-overlapping by construction: synthesis internals
    (random_resize/sample_place) are not separately wrapped, decode inside
    synthesis does not occur (images are loaded before synthesis_frames).
    """

    def __init__(self):
        self.acc = defaultdict(float)
        self._saved = []

    def _wrap(self, obj, name, bucket):
        fn = getattr(obj, name)
        acc = self.acc

        @functools.wraps(fn)
        def timed(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            acc[bucket] += time.perf_counter() - t0
            return out

        self._saved.append((obj, name, fn))
        setattr(obj, name, timed)

    def __enter__(self):
        for mod in (vd, sd):
            self._wrap(mod, "load_image_pil", "decode")
            self._wrap(mod, "load_ann_pil", "decode")
            self._wrap(mod, "finalize_sample", "finalize")
        self._wrap(sd, "synthesis_frames", "synthesis")
        self._wrap(T, "apply_resized_crop", "resized_crop")
        self._wrap(T, "apply_affine", "affine")
        self._wrap(T, "apply_color_jitter", "color_jitter")
        self._wrap(T, "to_grayscale", "grayscale")
        self._wrap(T, "hflip", "flip")
        self._wrap(T, "resize_short_side", "resize")
        self._wrap(T, "apply_crop_padded", "crop_pad")
        from swem_tpu.data.tps import JointRandomTPS
        self._wrap(JointRandomTPS, "__call__", "tps")
        return self

    def __exit__(self, *exc):
        for obj, name, fn in reversed(self._saved):
            setattr(obj, name, fn)
        self._saved.clear()


def breakdown(dataset, n_samples, seed=11):
    """Per-op ms/sample over the real sample() path."""
    # warm one sample (PIL/cv2 lazy init, file cache)
    sample_with_rng(dataset, 0, seed, 0)
    with OpTimer() as ot:
        t0 = time.perf_counter()
        for i in range(n_samples):
            sample_with_rng(dataset, i % len(dataset), seed, i)
        total = time.perf_counter() - t0
    ops = {k: 1e3 * v / n_samples for k, v in sorted(
        ot.acc.items(), key=lambda kv: -kv[1])}
    ops["other"] = 1e3 * total / n_samples - sum(ops.values())
    ops["TOTAL"] = 1e3 * total / n_samples
    return ops


def loader_rate(factory, batch, n_batches, num_workers, seed=13):
    """Steady-state samples/s through TrainLoader."""
    loader = TrainLoader(factory, batch, seed=seed, num_workers=num_workers,
                         prefetch=2)
    try:
        it = iter(loader)
        next(it)  # warm: pool spawn + first batch
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(it)
        dt = time.perf_counter() - t0
    finally:
        it.close()  # fire the generator's finally (stop event) promptly
        loader.close()  # and join the producer thread + pool
    return batch * n_batches / dt


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--data_root", default=None,
                    help="real DAVIS root (stage video) / pretrain root "
                         "(stage static); default: synthetic temp trees")
    ap.add_argument("--stage", choices=["video", "static", "both"],
                    default="both")
    ap.add_argument("--crop", type=int, default=384)
    ap.add_argument("--samples", type=int, default=32,
                    help="samples for the per-op breakdown")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--batches", type=int, default=5,
                    help="timed batches per loader config")
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 2],
                    help="num_workers values for the loader measurement")
    ap.add_argument("--step_ms", type=float, default=116.5,
                    help="train-step ms the pipeline must keep up with "
                         "(PARITY.md bs8 384^2 bf16)")
    args = ap.parse_args()

    tmp = None
    if args.data_root is None:
        tmp = tempfile.mkdtemp(prefix="loader_bench_")
        print(f"# synthesizing 480p data trees under {tmp} ...", flush=True)
        build_video_tree(tmp)
        build_static_tree(tmp)
        root = tmp
    else:
        root = args.data_root

    target = args.batch / (args.step_ms / 1e3)
    result = {"target_samples_per_s": round(target, 1)}
    stages = []
    if args.stage in ("video", "both"):
        stages.append(("video", functools.partial(make_video_dataset, root,
                                                  args.crop)))
    if args.stage in ("static", "both"):
        stages.append(("static", functools.partial(make_static_dataset, root,
                                                   args.crop)))

    for name, factory in stages:
        ds = factory()
        ops = breakdown(ds, args.samples)
        print(f"\n== {name} per-op ms/sample (n={args.samples}) ==")
        for k, v in ops.items():
            print(f"  {k:>12}: {v:7.1f}")
        rates = {}
        for w in args.workers:
            r = loader_rate(factory, args.batch, args.batches, w)
            rates[w] = r
            print(f"  loader nw={w}: {r:6.1f} samples/s", flush=True)
        per_core = max(rates.values())
        result[name] = {
            "ops_ms": {k: round(v, 1) for k, v in ops.items()},
            "loader_samples_per_s": {str(k): round(v, 1)
                                     for k, v in rates.items()},
            "cores_needed_1chip_bs8": round(target / per_core, 1),
        }
        print(f"  -> one v5e chip at bs{args.batch}/{args.step_ms}ms needs "
              f"~{target / per_core:.1f} perfectly-scaling cores ({name})")

    print(json.dumps(result))
    if tmp is not None:
        import shutil
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
