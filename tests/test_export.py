"""Serialized-artifact (jax.export) roundtrip tests.

The exported StableHLO programs must reproduce the live
``ChunkedVideoRunner`` bit-for-bit on the same backend: same engine code,
same chunk ladder, same fused preprocess — only the dispatch path differs.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swem_tpu.config import ModelConfig
from swem_tpu.engine import ChunkedVideoRunner, ladder_sizes
from swem_tpu.io.export import ExportedRunner, export_runner
from swem_tpu.models.swem import SWEM


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        backbone="resnet18", keydim=8, valdim=16, num_bases=4,
        num_em_iters=2, topl=2, max_objs=4, mdim=16,
    )
    model = SWEM(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
        jnp.zeros((1, 64, 96, 5)),
    )
    return cfg, model, variables


def _video(T, H, W, n_slots, seed=0):
    rng = np.random.default_rng(seed)
    frames = (rng.random((T, 1, H, W, 3)) * 255).astype(np.uint8)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    labels[40:60, 60:90] = 2
    onehot = (labels[..., None] == np.arange(n_slots + 1)).astype(np.float32)
    active = np.zeros((1, n_slots), bool)
    active[0, :2] = True
    return frames, onehot[None], active


def test_export_matches_live_runner(tiny, tmp_path):
    """Exported artifact == live ChunkedVideoRunner, incl. ladder tails."""
    cfg, model, variables = tiny
    H, W, T, chunk = 64, 96, 11, 4  # T-1 = 10 = 4 + 4 + 2: exercises ladder
    path = str(tmp_path / "artifact")
    export_runner(model, variables, path, frame_hw=(H, W), chunk=chunk,
                  platforms=("cpu",))

    frames, init_mask, active = _video(T, H, W, cfg.max_objs)
    exported = ExportedRunner(path)
    exported.warmup()
    got = exported(frames, init_mask, active)

    pre = lambda f: f.astype(jnp.float32) / 255.0
    runner = ChunkedVideoRunner(model, (H, W), chunk=chunk, preprocess=pre)
    want = runner(variables, jax.random.PRNGKey(0), frames,
                  jnp.asarray(init_mask), jnp.asarray(active))

    assert got.shape == (T - 1, 1, H, W) and got.dtype == np.uint8
    np.testing.assert_array_equal(got, np.asarray(want))


def test_export_manifest_and_files(tiny, tmp_path):
    cfg, model, variables = tiny
    path = str(tmp_path / "artifact")
    export_runner(model, variables, path, frame_hw=(64, 96), chunk=4,
                  platforms=("cpu",))
    with open(os.path.join(path, "manifest.json")) as f:
        m = json.load(f)
    assert m["sizes"] == [4] + ladder_sizes(4)
    assert m["frame_dtype"] == "uint8"
    assert m["model_config"]["backbone"] == "resnet18"
    for size in m["sizes"]:
        assert os.path.exists(
            os.path.join(path, "programs", f"chunk_{size}.stablehlo"))
    assert os.path.exists(os.path.join(path, "programs", "init.stablehlo"))
    assert os.path.exists(os.path.join(path, "weights.msgpack"))


def test_exported_session_matches_runner(tiny, tmp_path):
    """Streaming replay (chunk_1 program) == offline exported runner."""
    from swem_tpu.io.export import ExportedSession

    cfg, model, variables = tiny
    H, W, T = 64, 96, 5
    path = str(tmp_path / "artifact")
    export_runner(model, variables, path, frame_hw=(H, W), chunk=4,
                  platforms=("cpu",))
    frames, init_mask, active = _video(T, H, W, cfg.max_objs)

    offline = ExportedRunner(path)(frames, init_mask, active)

    labels = np.argmax(init_mask[0], axis=-1).astype(np.uint8)
    sess = ExportedSession(path)
    sess.warmup()
    sess.start(frames[0, 0], labels)
    stream = [sess.push(f[0]) for f in frames[1:]]
    assert sess.frames_seen == T
    # the offline runner skips the FINAL frame's memorize, which only
    # affects post-video state — per-frame predictions are identical
    np.testing.assert_array_equal(np.stack(stream), offline[:, 0])


def test_export_cli_end_to_end(tiny, tmp_path):
    """Orbax checkpoint -> export_model.py -> jax-only reload -> preds."""
    import subprocess
    import sys

    from swem_tpu.io.checkpoint import save_params

    cfg, model, variables = tiny
    ck = str(tmp_path / "variables")
    save_params(ck, variables)
    art = str(tmp_path / "art")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "export_model.py"),
         "--resume", ck, "--out", art, "--backbone", "resnet18",
         "--key_dim", "8", "--val_dim", "16", "--num_bases", "4",
         "--em_iters", "2", "--top_l", "2", "--max_objs", "4", "--mdim", "16",
         "--in_size", "64", "96", "--out_size", "64", "96", "--chunk", "4",
         "--platforms", "cpu"],
        capture_output=True, text=True, env=env, timeout=560, cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    frames, init_mask, active = _video(6, 64, 96, cfg.max_objs)
    runner = ExportedRunner(art)
    preds = runner(frames, init_mask, active)
    assert preds.shape == (5, 1, 64, 96) and preds.dtype == np.uint8


def test_export_input_validation(tiny, tmp_path):
    cfg, model, variables = tiny
    path = str(tmp_path / "artifact")
    export_runner(model, variables, path, frame_hw=(64, 96), chunk=4,
                  platforms=("cpu",))
    exported = ExportedRunner(path)
    frames, init_mask, active = _video(5, 64, 96, cfg.max_objs)
    with pytest.raises(TypeError):
        exported(frames.astype(np.float32), init_mask, active)
    with pytest.raises(ValueError):
        exported(frames[:, :, :32], init_mask, active)
    # T == 1: nothing to predict
    out = exported(frames[:1], init_mask, active)
    assert out.shape == (0, 1, 64, 96)
