"""CLI smoke tests: every entry point parses its arguments.

Guards the argparse surfaces (train.py / eval.py / evaluation CLIs /
verify_parity runbook) against import-time and flag regressions without
running any heavy work.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("cli", [
    "train.py",
    "eval.py",
    "evaluation_method.py",
    "evaluation_codalab.py",
    os.path.join("scripts", "verify_parity.py"),
    os.path.join("scripts", "export_model.py"),
])
def test_cli_help(cli):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, cli), "--help"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "usage" in out.stdout.lower()


# --------------------------------------------------------------------- #
# Flag -> SWEMConfig mapping (VERDICT r4 item 6): the reference shipped a
# bug in exactly this overlay layer (`--model SMEM` typo,
# /root/reference/train.py:52), so every user-visible flag is asserted to
# land in its dataclass field. train.py/eval.py expose get_args(argv) +
# build_config(args) as importable functions for this.

sys.path.insert(0, REPO)


def _train_cfg(argv):
    import train as train_cli

    return train_cli.build_config(train_cli.get_args(argv))


def _eval_cfg(argv):
    import eval as eval_cli

    return eval_cli.build_config(eval_cli.get_args(argv))


class TestTrainConfigMapping:
    def test_defaults(self):
        cfg = _train_cfg(["--data_root", "/d"])
        assert cfg.solver.stage == 0
        assert cfg.data.data_root == "/d"
        assert cfg.data.batch_size == 8
        assert cfg.model.backbone == "resnet50"
        assert cfg.model.dtype == "float32"
        assert cfg.solver.remat is None
        assert cfg.from_scratch is False
        assert cfg.resume is None

    def test_model_flags(self):
        cfg = _train_cfg([
            "--data_root", "/d", "--backbone", "resnet18", "--key_dim", "64",
            "--val_dim", "256", "--num_bases", "32", "--em_iters", "2",
            "--tau", "0.1", "--top_l", "16", "--num_obj", "3",
            "--dtype", "bfloat16", "--model", "SWEM",
        ])
        m = cfg.model
        assert (m.backbone, m.keydim, m.valdim) == ("resnet18", 64, 256)
        assert (m.num_bases, m.num_em_iters, m.em_tau) == (32, 2, 0.1)
        assert (m.topl, m.max_objs, m.dtype) == (16, 3, "bfloat16")
        assert m.model_name == "SWEM"
        # num_obj also drives the data layer's object budget
        assert cfg.data.max_num_objs == 3

    def test_solver_and_data_flags(self):
        cfg = _train_cfg([
            "--data_root", "/d", "--stage", "3", "--lr", "1e-4",
            "--weight_decay", "0.01", "--batch_size", "16",
            "--num_workers", "4", "--seed", "7", "--crop_size", "256",
            "--remat", "encoder", "--total_iters", "100", "200",
        ])
        assert cfg.solver.stage == 3
        assert cfg.solver.base_lr == 1e-4
        assert cfg.solver.weight_decay == 0.01
        assert cfg.solver.remat == "encoder"
        assert cfg.solver.stage_iters() == (100, 200)
        assert cfg.data.batch_size == 16
        assert cfg.data.num_workers == 4
        assert cfg.data.seed == 7
        assert cfg.data.vid_crop_size == (256, 256)

    def test_bare_remat_defaults_to_encoder(self):
        cfg = _train_cfg(["--data_root", "/d", "--remat"])
        assert cfg.solver.remat == "encoder"

    def test_loop_and_resume_flags(self):
        cfg = _train_cfg([
            "--data_root", "/d", "--exp", "myexp", "--log_dir", "/logs",
            "--resume", "/ckpt", "--from_scratch", "--log_period", "50",
            "--save_period", "1000", "--vis_period", "0",
        ])
        assert cfg.exp_name == "myexp" and cfg.log_dir == "/logs"
        assert cfg.resume == "/ckpt" and cfg.from_scratch is True
        assert (cfg.log_period, cfg.save_period, cfg.vis_period) == (50, 1000, 0)

    def test_single_object_flip(self):
        """num_obj=1 flips single-object mode (config.py:123-124 semantics)."""
        cfg = _train_cfg(["--data_root", "/d", "--num_obj", "1"])
        assert cfg.model.single_object is True
        assert cfg.model.max_objs == 1


class TestEvalConfigMapping:
    BASE = ["--data_root", "/d", "--resume", "/ckpt"]

    def test_defaults(self):
        cfg = _eval_cfg(self.BASE)
        assert cfg.eval.eval_set == "DAVIS17"
        assert cfg.eval.data_root == "/d"
        assert cfg.resume == "/ckpt"
        assert cfg.eval.video_batch == 1 and cfg.eval.obj_parallel == 1
        assert tuple(cfg.eval.scales) == (480,) and cfg.eval.flip is False
        assert cfg.model.dtype == "float32"

    def test_model_flags(self):
        cfg = _eval_cfg(self.BASE + [
            "--backbone", "resnet18", "--key_dim", "64", "--val_dim", "256",
            "--num_bases", "32", "--em_iters", "2", "--tau", "0.1",
            "--top_l", "16", "--max_objs", "4", "--dtype", "bfloat16",
            "--n_kernel", "3", "--sigma", "5.0",
        ])
        m = cfg.model
        assert (m.backbone, m.keydim, m.valdim) == ("resnet18", 64, 256)
        assert (m.num_bases, m.num_em_iters, m.em_tau) == (32, 2, 0.1)
        assert (m.topl, m.max_objs, m.dtype) == (16, 4, "bfloat16")
        assert (m.n_kernel, m.kernel_sigma) == (3, 5.0)
        # the eval layer's slot budget follows --max_objs too
        assert cfg.eval.max_objs == 4

    def test_eval_flags(self):
        cfg = _eval_cfg(self.BASE + [
            "--eval_set", "YTVOS19", "--ssize", "512", "--chunk", "8",
            "--video_batch", "3", "--obj_parallel", "2", "--visualize",
            "--scales", "480", "552", "--flip",
            "--davis_in_size", "240", "432", "--per_object_csv",
            "--stage", "2", "--exp_name", "e", "--log_dir", "/logs",
        ])
        e = cfg.eval
        assert e.eval_set == "YTVOS19" and e.ssize == 512 and e.chunk == 8
        assert e.video_batch == 3 and e.obj_parallel == 2
        assert e.visualize is True and e.per_object_csv is True
        assert tuple(e.scales) == (480, 552) and e.flip is True
        assert tuple(e.davis_in_size) == (240, 432)
        assert cfg.solver.stage == 2
        assert cfg.exp_name == "e" and cfg.log_dir == "/logs"
