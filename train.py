"""Training CLI (re-design of /root/reference/train.py:16-117).

Stages: 0 static pretrain, 1 DAVIS, 2 YTVOS, 3 DAVIS+YTVOS.

Multi-host: launch one process per host with JAX coordinator env vars set
(jax.distributed.initialize replaces the reference's NCCL env:// rendezvous,
train.py:24-41); the global batch is split across hosts automatically.

Example:
    python train.py --stage 0 --data_root /data --batch_size 8 --exp s0
    python train.py --stage 3 --data_root /data --batch_size 8 \\
        --resume logs/SWEM/S0/s0/checkpoints --from_scratch --exp s3

``--from_scratch`` is REQUIRED for stage transfers: without it the resume
restores the full S0 state including step=300000 >= S3's max_iter, so the
S3 run exits immediately. Omit it only to continue an interrupted run of
the SAME stage.
"""

from __future__ import annotations

import argparse
import os


def get_args(argv=None):
    p = argparse.ArgumentParser(description="SWEM-TPU training")
    p.add_argument("--model", default="SWEM")
    p.add_argument("--backbone", default="resnet50", choices=["resnet50", "resnet18"])
    p.add_argument("--stage", type=int, default=0, choices=[0, 1, 2, 3])
    p.add_argument("--data_root", required=True)
    p.add_argument("--exp", default="swem", help="experiment name")
    p.add_argument("--log_dir", default="logs")
    p.add_argument("--batch_size", type=int, default=8, help="global batch size")
    p.add_argument("--num_obj", type=int, default=2)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--key_dim", type=int, default=128)
    p.add_argument("--val_dim", type=int, default=512)
    p.add_argument("--num_bases", type=int, default=128)
    p.add_argument("--em_iters", type=int, default=4)
    p.add_argument("--tau", type=float, default=0.05)
    p.add_argument("--top_l", type=int, default=64)
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--resume", default=None,
                   help="checkpoint dir (orbax) or torch .pth to initialize from")
    p.add_argument("--from_scratch", action="store_true",
                   help="load weights only, reset optimizer/iteration")
    p.add_argument("--total_iters", type=int, nargs=2, default=None,
                   help="override (milestone, max_iter) for the stage")
    p.add_argument("--backbone_init", default=None,
                   help="torchvision resnet .pth files 'key.pth,value.pth' for "
                        "ImageNet backbone init (fixes the reference's broken "
                        "model_dirs scheme)")
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() (multi-host)")
    p.add_argument("--coordinator", default=None,
                   help="host:port rendezvous for --distributed (omit on "
                        "autodetected clusters: TPU pods, SLURM, OMPI)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--remat", default=None, nargs="?", const="encoder",
                   choices=["encoder", "block"],
                   help="rematerialize activations (jax.checkpoint) to cut "
                        "peak HBM: 'encoder' = key-trunk only (-40..57%% "
                        "temp memory for ~4%% step time — use for larger "
                        "batches/resolutions), 'block' = whole frame block "
                        "(measured strictly worse; see scripts/remat_mem.py)")
    p.add_argument("--crop_size", type=int, default=384)
    p.add_argument("--log_period", type=int, default=100)
    p.add_argument("--save_period", type=int, default=5000)
    p.add_argument("--vis_period", type=int, default=1000)
    return p.parse_args(argv)


def build_config(args):
    import dataclasses

    from swem_tpu.config import (
        DataConfig,
        LossConfig,
        ModelConfig,
        SolverConfig,
        SWEMConfig,
        single_object_config,
    )

    model = ModelConfig(
        model_name=args.model, backbone=args.backbone, keydim=args.key_dim,
        valdim=args.val_dim, num_bases=args.num_bases, num_em_iters=args.em_iters,
        em_tau=args.tau, topl=args.top_l, max_objs=args.num_obj, dtype=args.dtype,
    )
    solver = SolverConfig(stage=args.stage, base_lr=args.lr,
                          weight_decay=args.weight_decay, remat=args.remat)
    if args.total_iters is not None:
        over = tuple(args.total_iters)
        solver = dataclasses.replace(
            solver, pretrain_iters=over, maintrain_iters=over, davis_iters=over
        )
    data = DataConfig(
        seed=args.seed, max_num_objs=args.num_obj, data_root=args.data_root,
        batch_size=args.batch_size, num_workers=args.num_workers,
        vid_crop_size=(args.crop_size, args.crop_size),
    )
    cfg = SWEMConfig(
        model=model, data=data, solver=solver, loss=LossConfig(),
        exp_name=args.exp, log_dir=args.log_dir, resume=args.resume,
        from_scratch=args.from_scratch, log_period=args.log_period,
        save_period=args.save_period, vis_period=args.vis_period,
    )
    return single_object_config(cfg)


def init_backbones(trainer, args):
    """Optional ImageNet init from torchvision .pth files."""
    if not args.backbone_init:
        return
    import jax

    from swem_tpu.io.torch_import import convert_resnet_state_dict, load_torch_file
    from swem_tpu.train.trainer import TrainState

    paths = args.backbone_init.split(",")
    params = jax.device_get(trainer.state.params)
    stats = jax.device_get(trainer.state.batch_stats)
    key_sd = convert_resnet_state_dict(load_torch_file(paths[0]))
    params["key_encoder"]["trunk"] = key_sd["params"]
    stats["key_encoder"]["trunk"] = key_sd["batch_stats"]
    if len(paths) > 1:
        extra = 1 if trainer.cfg.model.single_object else 2
        val_sd = convert_resnet_state_dict(
            load_torch_file(paths[1]), extra_chan=extra, add_zero_conv_biases=True
        )
        params["value_encoder"]["trunk"] = val_sd["params"]
        stats["value_encoder"]["trunk"] = val_sd["batch_stats"]
    trainer.state = TrainState(
        params=params, batch_stats=stats,
        opt_state=trainer.tx.init(params), step=trainer.state.step,
    )
    trainer.logger.info(f"Initialized backbones from {paths}")


def main():
    args = get_args()
    import jax

    if args.distributed:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    cfg = build_config(args)

    from swem_tpu.train.loop import Trainer

    trainer = Trainer(cfg)
    init_backbones(trainer, args)
    trainer.train()


if __name__ == "__main__":
    main()
