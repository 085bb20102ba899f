"""Offline J&F evaluation of a results directory
(re-design of /root/reference/evaluation/evaluation_method.py:13-83).

Example:
    python evaluation_method.py --davis_path /data/DAVIS --year 2017 \\
        --set val --task semi-supervised --results_path outputs/DAVIS17/output
"""

from __future__ import annotations

import argparse
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--davis_path", required=True)
    p.add_argument("--year", default="2017", choices=["2016", "2017", "2019"])
    p.add_argument("--set", default="val", choices=["train", "val", "test-dev"])
    p.add_argument("--task", default="semi-supervised",
                   choices=["semi-supervised", "unsupervised"])
    p.add_argument("--results_path", required=True)
    p.add_argument("--per_object_csv", action="store_true",
                   help="also write the per-object per-frame J/F series to "
                   "per-object_results-<set>.csv")
    args = p.parse_args()

    from swem_tpu.eval.benchmark import DavisEvaluation, write_reports

    t0 = time.time()
    ev = DavisEvaluation(args.davis_path, year=args.year, gt_set=args.set,
                         task=args.task)
    metrics = ev.evaluate(args.results_path)
    write_reports(metrics, args.results_path, f"DAVIS{args.year[-2:]}",
                  per_object_csv=args.per_object_csv)
    sys.stdout.write(f"\nTotal time: {time.time() - t0:.1f}s\n")


if __name__ == "__main__":
    main()
