"""End-to-end evaluation pipeline tests on synthetic mini datasets.

Builds DAVIS- and YTVOS-shaped directory trees with tiny videos, runs the
full Evaluator (inference -> palette PNGs -> J&F metrics -> CSVs) on CPU with
a tiny model, and additionally validates the metric stack analytically
(perfect predictions -> J = F = 1, the reference's test_void_masks idea,
evaluation/pytest/test_evaluation.py:118-128).
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from swem_tpu.config import EvalConfig, ModelConfig, SWEMConfig
from swem_tpu.data.palette import davis_palette, save_seg_mask
from swem_tpu.eval.benchmark import DavisEvaluation, write_reports
from swem_tpu.eval.metrics import boundary_f_frames, jaccard, statistics


H, W = 64, 96


def make_label(t, kind="square"):
    lab = np.zeros((H, W), np.uint8)
    x = 8 + 2 * t
    lab[10:30, x : x + 20] = 1
    lab[40:56, 50:80] = 2
    return lab


def build_fake_davis(root, n_videos=2, n_frames=5):
    os.makedirs(os.path.join(root, "ImageSets", "2017"), exist_ok=True)
    names = [f"vid{i}" for i in range(n_videos)]
    with open(os.path.join(root, "ImageSets", "2017", "val.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    rng = np.random.default_rng(0)
    pal = davis_palette()
    for name in names:
        jdir = os.path.join(root, "JPEGImages", "480p", name)
        adir = os.path.join(root, "Annotations", "480p", name)
        os.makedirs(jdir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        for t in range(n_frames):
            img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(jdir, f"{t:05d}.jpg"))
            save_seg_mask(make_label(t), os.path.join(adir, f"{t:05d}.png"), pal)
    return names


class TestMetricStack:
    def test_perfect_prediction_scores_one(self, tmp_path):
        """GT copied as prediction -> J&F == 1 everywhere."""
        root = str(tmp_path / "davis")
        names = build_fake_davis(root)
        res = str(tmp_path / "results")
        pal = davis_palette()
        for name in names:
            os.makedirs(os.path.join(res, name), exist_ok=True)
            for t in range(5):
                save_seg_mask(make_label(t), os.path.join(res, name, f"{t:05d}.png"), pal)
        ev = DavisEvaluation(root, year="2017", gt_set="val")
        metrics = ev.evaluate(res)
        assert np.allclose(metrics["J"]["M"], 1.0)
        assert np.allclose(metrics["F"]["M"], 1.0)
        g = write_reports(metrics, str(tmp_path / "out"), "DAVIS17")
        assert abs(g["J&F-Mean"] - 1.0) < 1e-9
        assert os.path.exists(tmp_path / "out" / "global_results-DAVIS17.csv")

    def test_per_object_per_frame_rows(self, tmp_path):
        """write_reports logs one 'Per obj per frame' row per object per
        metric (basic_evaluator.py:311-316) and can write them as a CSV."""
        import csv

        root = str(tmp_path / "davis")
        names = build_fake_davis(root)
        res = str(tmp_path / "results")
        pal = davis_palette()
        for name in names:
            os.makedirs(os.path.join(res, name), exist_ok=True)
            for t in range(5):
                save_seg_mask(make_label(t), os.path.join(res, name, f"{t:05d}.png"), pal)
        metrics = DavisEvaluation(root, year="2017", gt_set="val").evaluate(res)

        class FakeLogger:
            def __init__(self):
                self.lines = []

            def info(self, msg):
                self.lines.append(msg)

        log = FakeLogger()
        write_reports(metrics, str(tmp_path / "out"), "DAVIS17", logger=log,
                      per_object_csv=True)
        j_rows = [l for l in log.lines if l.startswith("Per obj per frame J")]
        f_rows = [l for l in log.lines if l.startswith("Per obj per frame F")]
        # 2 videos x 2 objects, one row per object per metric
        assert len(j_rows) == 4 and len(f_rows) == 4
        assert any("vid0_1:" in l for l in j_rows)
        # each row carries the 3 middle frames (first/last excluded)
        assert all(len(eval(l.split(":", 1)[1])) == 3 for l in j_rows)
        csv_path = tmp_path / "out" / "per-object_results-DAVIS17.csv"
        with open(csv_path) as f:
            rows = list(csv.reader(f))
        assert len(rows) == 1 + 8  # header + 4 objects x {J, F}
        assert rows[1][0] == "vid0_1" and rows[1][1] == "J"
        assert all(abs(float(v) - 1.0) < 1e-9 for v in rows[1][2:])

    def test_void_pixels_excluded(self):
        """The reference's void-mask analytic check (test_evaluation.py:118-128)."""
        gt = np.zeros((200, 200))
        gt[100:150, 100:150] = 1
        void = np.zeros((200, 200))
        void[95:105, 95:105] = 1  # void straddles the corner
        pred = gt.copy()
        pred[void > 0] = 0  # prediction wrong only inside void
        j = jaccard(gt, pred, void)
        f = boundary_f_frames(gt[None], pred[None], void[None])
        assert float(j) == 1.0
        assert float(f[0]) == 1.0

    def test_statistics_decay(self):
        vals = np.linspace(1.0, 0.0, 20)
        M, R, D = statistics(vals)
        assert abs(M - 0.5) < 1e-6
        assert 0.45 < R < 0.55
        assert D > 0.6  # strong decay


class TestEvaluatorE2E:
    @pytest.fixture(scope="class")
    def fake_davis(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("davis")
        build_fake_davis(str(root))
        return str(root)

    def test_davis_eval_pipeline(self, fake_davis, tmp_path_factory):
        from swem_tpu.eval.evaluator import Evaluator
        from swem_tpu.models.swem import SWEM

        log_dir = str(tmp_path_factory.mktemp("logs"))
        model_cfg = ModelConfig(
            backbone="resnet18", keydim=8, valdim=16, num_bases=4,
            num_em_iters=2, topl=2, max_objs=4, mdim=16,
        )
        cfg = SWEMConfig(
            model=model_cfg,
            eval=EvalConfig(eval_set="DAVIS17", data_root=fake_davis, max_objs=4,
                            davis_in_size=(64, 96), chunk=2),
            log_dir=log_dir,
        )
        model = SWEM(model_cfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 96, 3)), jnp.zeros((1, H, W, 5)),
        )
        ev = Evaluator(cfg, variables)
        fps = ev.evaluate_davis()
        assert fps > 0
        # every frame of every video got a PNG
        for name in ("vid0", "vid1"):
            pngs = os.listdir(os.path.join(ev.out_root, name))
            assert len(pngs) == 5
        g = ev.get_metrics(per_object_csv=True)
        assert set(g) == {"J&F-Mean", "J-Mean", "J-Recall", "J-Decay",
                          "F-Mean", "F-Recall", "F-Decay"}
        assert np.isfinite(g["J&F-Mean"])
        # the eval.py --per_object_csv surface (evaluation_method.py's flag
        # routed through Evaluator.get_metrics)
        assert os.path.exists(
            os.path.join(ev.save_dir, "per-object_results-DAVIS17.csv"))

    def test_video_batched_matches_sequential(self, fake_davis, tmp_path_factory):
        """video_batch=2 throughput mode agrees with sequential eval
        (up to f32 batched-conv argmax ties; require > 99.9% pixels)."""
        from swem_tpu.eval.evaluator import Evaluator
        from swem_tpu.models.swem import SWEM

        model_cfg = ModelConfig(
            backbone="resnet18", keydim=8, valdim=16, num_bases=4,
            num_em_iters=2, topl=2, max_objs=4, mdim=16,
        )
        model = SWEM(model_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), jnp.zeros((1, H, W, 5)),
        )
        outs = {}
        for vb in (1, 2):
            cfg = SWEMConfig(
                model=model_cfg,
                eval=EvalConfig(eval_set="DAVIS17", data_root=fake_davis, max_objs=4,
                                davis_in_size=(64, 96), chunk=2, video_batch=vb),
                log_dir=str(tmp_path_factory.mktemp(f"logs_vb{vb}")),
            )
            ev = Evaluator(cfg, variables)
            ev.evaluate_davis()
            outs[vb] = ev.out_root
        total = agree = 0
        for name in ("vid0", "vid1"):
            for f in sorted(os.listdir(os.path.join(outs[1], name))):
                a = np.array(Image.open(os.path.join(outs[1], name, f)))
                b = np.array(Image.open(os.path.join(outs[2], name, f)))
                total += a.size
                agree += (a == b).sum()
        assert agree / total > 0.999, agree / total

    def test_obj_parallel_matches_sequential(self, fake_davis, tmp_path_factory):
        """obj_parallel=2 (each video's object slots sharded over 2 virtual
        devices) produces the sequential evaluator's PNGs (up to f32
        partitioning argmax ties; require > 99.9% pixels)."""
        from swem_tpu.eval.evaluator import Evaluator
        from swem_tpu.models.swem import SWEM

        model_cfg = ModelConfig(
            backbone="resnet18", keydim=8, valdim=16, num_bases=4,
            num_em_iters=2, topl=2, max_objs=4, mdim=16,
        )
        model = SWEM(model_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), jnp.zeros((1, H, W, 5)),
        )
        outs = {}
        for op in (1, 2):
            cfg = SWEMConfig(
                model=model_cfg,
                eval=EvalConfig(eval_set="DAVIS17", data_root=fake_davis, max_objs=4,
                                davis_in_size=(64, 96), chunk=2, obj_parallel=op),
                log_dir=str(tmp_path_factory.mktemp(f"logs_op{op}")),
            )
            ev = Evaluator(cfg, variables)
            ev.evaluate_davis()
            outs[op] = ev.out_root
        total = agree = 0
        for name in ("vid0", "vid1"):
            for f in sorted(os.listdir(os.path.join(outs[1], name))):
                a = np.array(Image.open(os.path.join(outs[1], name, f)))
                b = np.array(Image.open(os.path.join(outs[2], name, f)))
                total += a.size
                agree += (a == b).sum()
        assert agree / total > 0.999, agree / total

    def test_ytvos_eval_pipeline(self, tmp_path_factory):
        import json

        from swem_tpu.eval.evaluator import Evaluator
        from swem_tpu.models.swem import SWEM

        root = str(tmp_path_factory.mktemp("ytvos"))
        pal = davis_palette()
        rng = np.random.default_rng(1)
        name = "video0"
        jdir = os.path.join(root, "JPEGImages", name)
        adir = os.path.join(root, "Annotations", name)
        os.makedirs(jdir)
        os.makedirs(adir)
        frames = [f"{i:05d}" for i in range(5)]
        for fn in frames:
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(jdir, fn + ".jpg"))
        # object 1 appears at frame 0; object 3 (original id 3) at frame 2
        lab0 = np.zeros((64, 64), np.uint8)
        lab0[8:24, 8:24] = 1
        save_seg_mask(lab0, os.path.join(adir, "00000.png"), pal)
        lab2 = np.zeros((64, 64), np.uint8)
        lab2[40:60, 40:60] = 3
        save_seg_mask(lab2, os.path.join(adir, "00002.png"), pal)
        meta = {"videos": {name: {"objects": {
            "1": {"frames": ["00000", "00002", "00004"]},
            "3": {"frames": ["00002", "00004"]},
        }}}}
        with open(os.path.join(root, "meta.json"), "w") as f:
            json.dump(meta, f)

        model_cfg = ModelConfig(
            backbone="resnet18", keydim=8, valdim=16, num_bases=4,
            num_em_iters=2, topl=2, max_objs=4, mdim=16,
        )
        cfg = SWEMConfig(
            model=model_cfg,
            eval=EvalConfig(eval_set="YTVOS19", data_root=root, max_objs=4, ssize=64,
                            chunk=2),  # exercise the chunked segment path
            log_dir=str(tmp_path_factory.mktemp("logs2")),
        )
        model = SWEM(model_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 5)),
        )
        ev = Evaluator(cfg, variables)
        fps = ev.evaluate_ytvos()
        assert fps > 0
        outs = sorted(os.listdir(os.path.join(ev.out_root, name)))
        # only annotated frames are saved (names_to_save)
        assert outs == ["00000.png", "00002.png", "00004.png"]
        # saved ids are original annotation ids (1 and 3, never 2)
        seen = set()
        for png in outs:
            seen |= set(np.unique(np.array(Image.open(os.path.join(ev.out_root, name, png)))))
        assert seen <= {0, 1, 3}
        # frame 2 must contain the injected object with original id 3
        m2 = np.array(Image.open(os.path.join(ev.out_root, name, "00002.png")))
        assert (m2 == 3).sum() > 0

    def test_ytvos_native_resize_path(self, tmp_path_factory):
        """YTVOS frames ship uint8 at NATIVE size; the /255 + bicubic resize
        to the /16-divisible inference size fuses into the chunk programs
        (out_size stays native). 80x80 native -> 64x64 inference."""
        import json

        from swem_tpu.data.ytvos_test import YTVOSTestSet
        from swem_tpu.eval.evaluator import Evaluator
        from swem_tpu.models.swem import SWEM

        root = str(tmp_path_factory.mktemp("ytvos_nat"))
        pal = davis_palette()
        rng = np.random.default_rng(3)
        name = "video0"
        jdir = os.path.join(root, "JPEGImages", name)
        adir = os.path.join(root, "Annotations", name)
        os.makedirs(jdir)
        os.makedirs(adir)
        frames = [f"{i:05d}" for i in range(4)]
        for fn in frames:
            img = (rng.random((80, 80, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(jdir, fn + ".jpg"))
        lab0 = np.zeros((80, 80), np.uint8)
        lab0[10:30, 10:30] = 1
        save_seg_mask(lab0, os.path.join(adir, "00000.png"), pal)
        meta = {"videos": {name: {"objects": {
            "1": {"frames": ["00000", "00002"]},
        }}}}
        with open(os.path.join(root, "meta.json"), "w") as f:
            json.dump(meta, f)

        ds = YTVOSTestSet(root, short_size=64, n_slots=4)
        v = ds[0]
        assert v.frames.dtype == np.uint8          # native uint8, no host f32
        assert v.frames.shape[1:3] == (80, 80)     # native resolution
        assert tuple(v.in_size) == (64, 64)        # /16-divisible short side
        assert v.original_size == (80, 80)

        model_cfg = ModelConfig(
            backbone="resnet18", keydim=8, valdim=16, num_bases=4,
            num_em_iters=2, topl=2, max_objs=4, mdim=16,
        )
        cfg = SWEMConfig(
            model=model_cfg,
            eval=EvalConfig(eval_set="YTVOS19", data_root=root, max_objs=4,
                            ssize=64, chunk=2),
            log_dir=str(tmp_path_factory.mktemp("logs_nat")),
        )
        model = SWEM(model_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 5)),
        )
        ev = Evaluator(cfg, variables)
        fps = ev.evaluate_ytvos()
        assert fps > 0
        outs = sorted(os.listdir(os.path.join(ev.out_root, name)))
        assert outs == ["00000.png", "00002.png"]
        for png in outs:  # predictions at NATIVE out size
            m = np.array(Image.open(os.path.join(ev.out_root, name, png)))
            assert m.shape == (80, 80)

    @staticmethod
    def _build_fake_ytvos(root):
        """4 synthetic videos exercising the batched grouping: three 64x64
        (one with a mid-video injection, one shorter -> padding), one 80x80
        (different shape signature -> its own group)."""
        import json

        pal = davis_palette()
        rng = np.random.default_rng(7)
        meta = {"videos": {}}

        def add_video(name, hw, n_frames, objects, labels):
            jdir = os.path.join(root, "JPEGImages", name)
            adir = os.path.join(root, "Annotations", name)
            os.makedirs(jdir)
            os.makedirs(adir)
            for i in range(n_frames):
                img = (rng.random(hw + (3,)) * 255).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(jdir, f"{i:05d}.jpg"))
            for fidx, lab in labels.items():
                save_seg_mask(lab, os.path.join(adir, f"{fidx:05d}.png"), pal)
            meta["videos"][name] = {"objects": objects}

        lab_a = np.zeros((64, 64), np.uint8)
        lab_a[8:24, 8:24] = 1
        lab_inj = np.zeros((64, 64), np.uint8)
        lab_inj[40:60, 40:60] = 3
        add_video("vid_inj", (64, 64), 5,
                  {"1": {"frames": ["00000", "00002", "00004"]},
                   "3": {"frames": ["00002", "00004"]}},
                  {0: lab_a, 2: lab_inj})
        lab_b = np.zeros((64, 64), np.uint8)
        lab_b[30:50, 10:40] = 2
        add_video("vid_short", (64, 64), 4,
                  {"2": {"frames": ["00000", "00002"]}}, {0: lab_b})
        lab_c = np.zeros((64, 64), np.uint8)
        lab_c[5:20, 30:60] = 1
        add_video("vid_plain", (64, 64), 5,
                  {"1": {"frames": ["00000", "00003"]}}, {0: lab_c})
        lab_d = np.zeros((80, 80), np.uint8)
        lab_d[10:30, 10:30] = 1
        add_video("vid_big", (80, 80), 4,
                  {"1": {"frames": ["00000", "00002"]}}, {0: lab_d})

        import json as _json

        with open(os.path.join(root, "meta.json"), "w") as f:
            _json.dump(meta, f)

    def test_ytvos_peek_matches_getitem(self, tmp_path_factory):
        """peek() returns the full shape signature without decoding frames."""
        from swem_tpu.data.ytvos_test import YTVOSTestSet

        root = str(tmp_path_factory.mktemp("ytvos_peek"))
        self._build_fake_ytvos(root)
        ds = YTVOSTestSet(root, short_size=64, n_slots=4)
        for idx in range(len(ds)):
            name, raw_hw, in_size, out_size, n_objs, n_frames = ds.peek(idx)
            v = ds[idx]
            assert name == v.name
            assert raw_hw == tuple(v.frames.shape[1:3])
            assert tuple(in_size) == tuple(v.in_size)
            assert tuple(out_size) == tuple(v.original_size)
            assert n_objs == v.n_objs
            assert n_frames == v.frames.shape[0]

    def test_ytvos_batched_matches_sequential(self, tmp_path_factory):
        """video_batch=2 YTVOS throughput mode writes the sequential mode's
        PNGs (up to f32 batched-conv argmax ties; > 99.9% pixels), incl. a
        mid-video injection, a shorter batch-mate (padding), and a
        different-resolution video (its own group)."""
        from swem_tpu.eval.evaluator import Evaluator
        from swem_tpu.models.swem import SWEM

        root = str(tmp_path_factory.mktemp("ytvos_vb"))
        self._build_fake_ytvos(root)

        model_cfg = ModelConfig(
            backbone="resnet18", keydim=8, valdim=16, num_bases=4,
            num_em_iters=2, topl=2, max_objs=4, mdim=16,
        )
        model = SWEM(model_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 5)),
        )
        outs = {}
        for vb in (1, 2):
            cfg = SWEMConfig(
                model=model_cfg,
                eval=EvalConfig(eval_set="YTVOS19", data_root=root, max_objs=4,
                                ssize=64, chunk=2, video_batch=vb),
                log_dir=str(tmp_path_factory.mktemp(f"logs_ytvb{vb}")),
            )
            ev = Evaluator(cfg, variables)
            fps = ev.evaluate_ytvos()  # vb routes to the batched mode
            assert fps > 0
            outs[vb] = ev.out_root
        total = agree = 0
        for name in ("vid_inj", "vid_short", "vid_plain", "vid_big"):
            seq_files = sorted(os.listdir(os.path.join(outs[1], name)))
            bat_files = sorted(os.listdir(os.path.join(outs[2], name)))
            assert seq_files == bat_files and seq_files  # same saved frames
            for f in seq_files:
                a = np.array(Image.open(os.path.join(outs[1], name, f)))
                b = np.array(Image.open(os.path.join(outs[2], name, f)))
                assert a.shape == b.shape
                total += a.size
                agree += (a == b).sum()
        assert agree / total > 0.999, agree / total
        # the injected object survives batching with its ORIGINAL id (3)
        m2 = np.array(Image.open(os.path.join(outs[2], "vid_inj", "00002.png")))
        assert (m2 == 3).sum() > 0

    def test_verify_parity_runbook(self, fake_davis, tmp_path_factory, monkeypatch):
        """scripts/verify_parity.py end to end: orbax checkpoint -> eval ->
        CSV -> self-diff gate passes with |diff| = 0."""
        import importlib.util
        import sys as _sys

        from swem_tpu.io.checkpoint import save_params
        from swem_tpu.models.swem import SWEM

        model_cfg = ModelConfig(
            backbone="resnet18", keydim=8, valdim=16, num_bases=4,
            num_em_iters=2, topl=2, max_objs=4, mdim=16,
        )
        model = SWEM(model_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), jnp.zeros((1, H, W, 5)),
        )
        ckpt = str(tmp_path_factory.mktemp("ckpt") / "vars")
        save_params(ckpt, variables)

        spec = importlib.util.spec_from_file_location(
            "verify_parity",
            os.path.join(os.path.dirname(__file__), "..", "scripts", "verify_parity.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        log_dir = str(tmp_path_factory.mktemp("logs_vp"))
        base_argv = [
            "verify_parity.py", "--ref_ckpt", ckpt, "--davis_root", fake_davis,
            "--eval_set", "DAVIS17", "--backbone", "resnet18",
            "--key_dim", "8", "--val_dim", "16", "--num_bases", "4",
            "--top_l", "2", "--max_objs", "4", "--mdim", "16",
            "--em_iters", "2", "--chunk", "2", "--davis_in_size", "64", "96",
            "--log_dir", log_dir,
        ]
        # first run: no ref CSV -> evaluates, writes our CSV, exit 0
        monkeypatch.setattr(_sys, "argv", base_argv)
        assert mod.main() == 0
        ours = os.path.join(
            log_dir, "SWEM", "S0", "verify_parity", "results", "DAVIS17",
            "global_results-DAVIS17.csv",
        )
        assert os.path.exists(ours)
        # second run: self-diff -> |dJ&F| == 0 -> gate passes
        monkeypatch.setattr(_sys, "argv", base_argv + ["--ref_csv", ours])
        assert mod.main() == 0

    def test_multi_scale_flip_runs(self, fake_davis, tmp_path_factory):
        """Multi-scale + flip path completes and writes every frame."""
        from swem_tpu.eval.evaluator import Evaluator
        from swem_tpu.models.swem import SWEM

        model_cfg = ModelConfig(
            backbone="resnet18", keydim=8, valdim=16, num_bases=4,
            num_em_iters=2, topl=2, max_objs=4, mdim=16,
        )
        cfg = SWEMConfig(
            model=model_cfg,
            eval=EvalConfig(eval_set="DAVIS17", data_root=fake_davis, max_objs=4,
                            davis_in_size=(64, 96), scales=(64, 48), flip=True),
            log_dir=str(tmp_path_factory.mktemp("logs_ms")),
        )
        model = SWEM(model_cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), jnp.zeros((1, H, W, 5)),
        )
        ev = Evaluator(cfg, variables)
        fps = ev.evaluate_davis()
        assert fps > 0
        for name in ("vid0", "vid1"):
            assert len(os.listdir(os.path.join(ev.out_root, name))) == 5
