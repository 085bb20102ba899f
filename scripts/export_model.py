"""Export a trained SWEM checkpoint to a serialized inference artifact.

Produces a directory of versioned StableHLO programs + weights + manifest
(see swem_tpu/io/export.py) that replays DAVIS-style fixed-size inference
with jax alone — no model code, no flax re-trace. The TPU-native answer to
"how do I deploy this?", which the reference leaves at pickled state_dicts
plus its full Python tree (/root/reference/methods/__init__.py:26-38).

Example:
    python scripts/export_model.py --resume ckpts/swem.pth \\
        --out artifacts/swem_480p --in_size 480 864 --out_size 480 854

Consume with:
    from swem_tpu.io.export import ExportedRunner
    runner = ExportedRunner("artifacts/swem_480p"); runner.warmup()
    preds = runner(frames_u8, init_mask_onehot, active)   # (T,1,H,W,3) uint8
"""

from __future__ import annotations

import argparse


def get_args():
    p = argparse.ArgumentParser(description="SWEM-TPU inference export")
    p.add_argument("--resume", required=True,
                   help="checkpoint: torch .pth (auto-converted) or orbax dir")
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--backbone", default="resnet50",
                   choices=["resnet50", "resnet18"])
    p.add_argument("--key_dim", type=int, default=128)
    p.add_argument("--val_dim", type=int, default=512)
    p.add_argument("--num_bases", type=int, default=128)
    p.add_argument("--em_iters", type=int, default=4)
    p.add_argument("--tau", type=float, default=0.05)
    p.add_argument("--top_l", type=int, default=64)
    p.add_argument("--max_objs", type=int, default=8)
    p.add_argument("--mdim", type=int, default=256, help="decoder width")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--in_size", type=int, nargs=2, default=(480, 864),
                   metavar=("H", "W"), help="raw uint8 frame size fed to the "
                   "artifact (DAVIS eval default)")
    p.add_argument("--out_size", type=int, nargs=2, default=(480, 854),
                   metavar=("H", "W"), help="prediction size")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--scores", action="store_true",
                   help="emit f32 soft masks instead of uint8 indices")
    p.add_argument("--injectable", action="store_true",
                   help="export YTVOS mid-video object injection inputs "
                   "(ExportedRunner injections / ExportedSession.add_objects)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    return p.parse_args()


def main():
    args = get_args()
    from swem_tpu.config import EvalConfig, ModelConfig, SWEMConfig
    from swem_tpu.io.export import export_runner
    from swem_tpu.models.swem import SWEM
    from swem_tpu.registry import load_variables

    model_cfg = ModelConfig(
        backbone=args.backbone, keydim=args.key_dim, valdim=args.val_dim,
        num_bases=args.num_bases, num_em_iters=args.em_iters,
        em_tau=args.tau, topl=args.top_l, max_objs=args.max_objs,
        mdim=args.mdim, dtype=args.dtype,
    )
    cfg = SWEMConfig(model=model_cfg,
                     eval=EvalConfig(data_root="", max_objs=args.max_objs))
    variables = load_variables(cfg, args.resume, max_objs=args.max_objs)
    model = SWEM(model_cfg)
    export_runner(
        model, variables, args.out,
        frame_hw=tuple(args.in_size), out_size=tuple(args.out_size),
        batch=args.batch, chunk=args.chunk, scores=args.scores,
        injectable=args.injectable, seed=args.seed,
        platforms=tuple(args.platforms),
    )
    print(f"wrote artifact to {args.out}")


if __name__ == "__main__":
    main()
