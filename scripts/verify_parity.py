#!/usr/bin/env python
"""Parity-verification runbook: reference checkpoint -> J&F diff in one command.

The BASELINE.md north star is DAVIS-2017 val J&F within 0.2 of whatever the
PyTorch reference checkpoint reproduces (/root/reference/methods/
basic_modules/basic_evaluator.py:271-328 machinery). This script closes that
loop on any host that has the data and weights:

    1. convert the reference torch checkpoint (``--ref_ckpt swem.pth``) via
       swem_tpu.io.torch_import (conv OIHW->HWIO, frozen-BN stats, optional
       SO->MO conv1 widening),
    2. run the full DAVIS evaluation (PNG predictions + metrics CSVs),
    3. diff our ``global_results-<set>.csv`` against a reference-produced
       CSV (``--ref_csv``) and gate on |dJ&F| <= --tol.

Usage on a host with data + weights:

    PYTHONPATH=/path/to/repo python scripts/verify_parity.py \
        --ref_ckpt ckpts/swem.pth \
        --davis_root /data/DAVIS \
        --ref_csv reference_outputs/global_results-val.csv \
        --eval_set DAVIS17

``--ref_csv`` is a CSV produced by the reference's own evaluator
(evaluation_method.py or basic_evaluator.get_metrics — identical header:
J&F-Mean, J-Mean, J-Recall, J-Decay, F-Mean, F-Recall, F-Decay). To produce
it once: run ``python eval.py --eval_set DAVIS17`` in the reference repo with
the same checkpoint, then copy logs/.../global_results-val.csv.

Without ``--ref_csv`` the script still converts + evaluates and prints our
numbers (exit 0), so the gate can be applied later.

Exit status: 0 = within tolerance (or no ref CSV), 1 = parity gate failed.

This environment note: the docker image used for framework development has
no DAVIS data, no ImageNet weights and no reference checkpoints (zero
egress), so this script is the hand-off artifact — one command stands
between the repo and the north-star number the moment weights exist.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_args():
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("--ref_ckpt", required=True,
                   help="reference torch checkpoint (.pth) or orbax dir")
    p.add_argument("--davis_root", required=True,
                   help="DAVIS root (contains JPEGImages/, Annotations/, ImageSets/)")
    p.add_argument("--eval_set", default="DAVIS17", choices=["DAVIS16", "DAVIS17"])
    p.add_argument("--ref_csv", default=None,
                   help="reference-produced global_results CSV to diff against")
    p.add_argument("--ref_csv_scale", default="auto",
                   choices=["auto", "points", "fraction"],
                   help="unit of --ref_csv values: 'fraction' ([0,1], x100), "
                        "'points' ([0,100]), or 'auto' (heuristic: scale "
                        "when max <= 1.5 — a degenerate run below 1.5 points "
                        "would be misread, so pass the unit explicitly for "
                        "anything but healthy checkpoints)")
    p.add_argument("--ours_csv_scale", default="fraction",
                   choices=["points", "fraction"],
                   help="unit of our CSV (swem_tpu writes fractions)")
    p.add_argument("--tol", type=float, default=0.2,
                   help="max |J&F-Mean| difference in points (BASELINE.md gate)")
    p.add_argument("--backbone", default="resnet50", choices=["resnet50", "resnet18"])
    p.add_argument("--num_bases", type=int, default=128)
    p.add_argument("--top_l", type=int, default=64)
    p.add_argument("--max_objs", type=int, default=8)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                   help="float32 for the parity gate; bfloat16 for speed checks")
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--exp_name", default="verify_parity")
    # small-scale knobs (hermetic tests / debug runs)
    p.add_argument("--key_dim", type=int, default=128)
    p.add_argument("--val_dim", type=int, default=512)
    p.add_argument("--mdim", type=int, default=256)
    p.add_argument("--em_iters", type=int, default=4)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--davis_in_size", type=int, nargs=2, default=(480, 864),
                   metavar=("H", "W"))
    return p.parse_args()


def read_global_csv(path: str) -> dict:
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    header, vals = rows[0], rows[1]
    return {h.strip(): float(v) for h, v in zip(header, vals)}


def main():
    args = get_args()

    from swem_tpu.config import EvalConfig, ModelConfig, SWEMConfig
    from swem_tpu.registry import load_variables

    model = ModelConfig(
        backbone=args.backbone, num_bases=args.num_bases, topl=args.top_l,
        max_objs=args.max_objs, dtype=args.dtype, keydim=args.key_dim,
        valdim=args.val_dim, mdim=args.mdim, num_em_iters=args.em_iters,
    )
    ev = EvalConfig(eval_set=args.eval_set, data_root=args.davis_root,
                    max_objs=args.max_objs, chunk=args.chunk,
                    davis_in_size=tuple(args.davis_in_size))
    cfg = SWEMConfig(model=model, eval=ev, exp_name=args.exp_name,
                     log_dir=args.log_dir, resume=args.ref_ckpt)

    print(f"[1/3] converting checkpoint {args.ref_ckpt} ...")
    variables = load_variables(cfg, args.ref_ckpt, max_objs=args.max_objs)

    print(f"[2/3] evaluating {args.eval_set} at {args.davis_root} ...")
    from swem_tpu.eval.evaluator import Evaluator

    evaluator = Evaluator(cfg, variables)
    metrics = evaluator.val()  # runs inference + writes CSVs
    ours_csv = os.path.join(evaluator.save_dir, f"global_results-{args.eval_set}.csv")
    ours = read_global_csv(ours_csv)
    print(f"[3/3] our results ({ours_csv}):")
    print("      " + " ".join(f"{k}={v:.3f}" for k, v in ours.items()))

    if args.ref_csv is None:
        print("no --ref_csv given: skipping the parity gate "
              "(re-run with --ref_csv to apply the within-"
              f"{args.tol} J&F gate)")
        return 0

    ref = read_global_csv(args.ref_csv)

    # the gate is in J&F points; scale each CSV by its declared unit
    def to_points(vals: dict, scale_mode: str) -> float:
        if scale_mode == "fraction":
            return vals["J&F-Mean"] * 100.0
        if scale_mode == "points":
            return vals["J&F-Mean"]
        # auto heuristic — only safe for healthy (>1.5-point) runs
        return vals["J&F-Mean"] * (100.0 if max(vals.values()) <= 1.5 else 1.0)

    diff = abs(to_points(ours, args.ours_csv_scale)
               - to_points(ref, args.ref_csv_scale))
    print(f"reference J&F-Mean: {ref['J&F-Mean']:.3f}  ours: {ours['J&F-Mean']:.3f}  "
          f"|diff| = {diff:.3f} points (tol {args.tol})")
    if diff <= args.tol:
        print("PARITY GATE: PASS")
        return 0
    print("PARITY GATE: FAIL")
    return 1


if __name__ == "__main__":
    sys.exit(main())
