"""Evaluation CLI (re-design of /root/reference/eval.py:11-62).

Examples:
    python eval.py --eval_set DAVIS17 --data_root /data/DAVIS \\
        --resume ckpts/swem.pth
    python eval.py --eval_set YTVOS19 --data_root /data/YTVOS19/valid_all_frames \\
        --resume ckpts/orbax_dir
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def get_args(argv=None):
    p = argparse.ArgumentParser(description="SWEM-TPU evaluation")
    p.add_argument("--model", default="SWEM")
    p.add_argument("--backbone", default="resnet50", choices=["resnet50", "resnet18"])
    p.add_argument("--eval_set", default="DAVIS17",
                   choices=["DAVIS16", "DAVIS17", "DAVIS17Test", "YTVOS18", "YTVOS19"])
    p.add_argument("--data_root", required=True, help="dataset root for eval_set")
    p.add_argument("--resume", required=True,
                   help="checkpoint: torch .pth (auto-converted) or orbax dir")
    p.add_argument("--exp_name", default="swem")
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--ssize", type=int, default=480)
    p.add_argument("--key_dim", type=int, default=128)
    p.add_argument("--val_dim", type=int, default=512)
    p.add_argument("--num_bases", type=int, default=128)
    p.add_argument("--em_iters", type=int, default=4)
    p.add_argument("--tau", type=float, default=0.05)
    p.add_argument("--top_l", type=int, default=64)
    p.add_argument("--max_objs", type=int, default=8)
    p.add_argument("--n_kernel", type=int, default=0,
                   help="Gaussian locality reweighting kernels (0 = off)")
    p.add_argument("--sigma", type=float, default=7.0)
    p.add_argument("--stage", type=int, default=3)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--video_batch", type=int, default=1,
                   help="videos per device batch (throughput mode)")
    p.add_argument("--obj_parallel", type=int, default=1,
                   help="shard each video's object slots over this many "
                        "chips (multi-chip latency for many-object videos; "
                        "composes with --video_batch)")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize(); each process "
                        "evaluates a disjoint slice of the video list "
                        "(shared filesystem), process 0 computes metrics")
    p.add_argument("--coordinator", default=None,
                   help="host:port rendezvous for --distributed (omit on "
                        "autodetected clusters: TPU pods, SLURM, OMPI)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--scales", type=int, nargs="+", default=[480],
                   help="multi-scale inference (score averaging)")
    p.add_argument("--flip", action="store_true", help="add flipped-input scores")
    p.add_argument("--davis_in_size", type=int, nargs=2, default=(480, 864),
                   metavar=("H", "W"),
                   help="fixed DAVIS inference size (debug/small-scale runs)")
    p.add_argument("--per_object_csv", action="store_true",
                   help="also write the per-object per-frame J/F series to "
                        "per-object_results-<set>.csv")
    return p.parse_args(argv)


def build_config(args):
    from swem_tpu.config import EvalConfig, ModelConfig, SolverConfig, SWEMConfig

    # DAVIS16 collapses mask ids in the dataset but still runs the
    # multi-object model (the reference never flips MODEL.SINGLE_OBJ at
    # eval time; basic_evaluator.py:51-52 only passes single_obj to the
    # dataset reader)
    model = ModelConfig(
        model_name=args.model, backbone=args.backbone, keydim=args.key_dim,
        valdim=args.val_dim, num_bases=args.num_bases, num_em_iters=args.em_iters,
        em_tau=args.tau, topl=args.top_l, max_objs=args.max_objs, dtype=args.dtype,
        n_kernel=args.n_kernel, kernel_sigma=args.sigma,
    )
    ev = EvalConfig(
        eval_set=args.eval_set, data_root=args.data_root, ssize=args.ssize,
        max_objs=args.max_objs, visualize=args.visualize, chunk=args.chunk,
        davis_in_size=tuple(args.davis_in_size),
        scales=tuple(args.scales), flip=args.flip,
        video_batch=args.video_batch, obj_parallel=args.obj_parallel,
        per_object_csv=args.per_object_csv,
    )
    return SWEMConfig(model=model, eval=ev, solver=SolverConfig(stage=args.stage),
                      exp_name=args.exp_name, log_dir=args.log_dir, resume=args.resume)


def load_variables(cfg, resume: str):
    """Checkpoint loading incl. single-object -> multi-object surgery."""
    from swem_tpu.registry import load_variables as _load

    return _load(cfg, resume, max_objs=cfg.eval.max_objs)


def main():
    args = get_args()
    if args.distributed:
        import jax

        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    cfg = build_config(args)
    variables = load_variables(cfg, args.resume)

    from swem_tpu.eval.evaluator import Evaluator

    evaluator = Evaluator(cfg, variables)
    evaluator.val()
    evaluator.logger.info("Evaluation done.")


if __name__ == "__main__":
    main()
