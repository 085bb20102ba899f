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


@pytest.fixture(scope="module")
def inj_artifact(tiny, tmp_path_factory):
    """An injectable artifact (YTVOS protocol), exported once per module."""
    cfg, model, variables = tiny
    path = str(tmp_path_factory.mktemp("export") / "inj_artifact")
    export_runner(model, variables, path, frame_hw=(64, 96), chunk=4,
                  platforms=("cpu",), injectable=True)
    return path


def test_injectable_export_matches_live_runner(tiny, inj_artifact):
    """Exported injectable artifact == live injectable ChunkedVideoRunner,
    incl. slot-activation threading across the chunk boundary."""
    cfg, model, variables = tiny
    H, W, T = 64, 96, 8  # frames 1..7 = chunk4 + ladder 2 + 1
    frames, init_mask, active = _video(T, H, W, cfg.max_objs)
    idx_map = np.zeros((1, H, W), np.uint8)
    idx_map[0, 5:25, 5:30] = 3  # object 3 appears at frame 3 (inside chunk 1)
    new = np.zeros((1, cfg.max_objs), bool)
    new[0, 2] = True
    injections = {3: (idx_map, new)}

    exported = ExportedRunner(inj_artifact)
    exported.warmup()
    got = exported(frames, init_mask, active, injections=injections)

    pre = lambda f: f.astype(jnp.float32) / 255.0
    runner = ChunkedVideoRunner(model, (H, W), chunk=4, preprocess=pre,
                                injectable=True)
    want = runner(variables, jax.random.PRNGKey(0), frames,
                  jnp.asarray(init_mask), jnp.asarray(active),
                  injections=injections)
    np.testing.assert_array_equal(got, np.asarray(want))
    assert (got[3:] == 3).sum() > 0  # the injected object persists


def test_exported_session_injection_matches_live(tiny, inj_artifact):
    """ExportedSession.add_objects == serve.StreamingSession.add_objects."""
    from swem_tpu.io.export import ExportedSession
    from swem_tpu.serve import StreamingSession

    cfg, model, variables = tiny
    H, W = 64, 96
    frames, init_mask, _ = _video(6, H, W, cfg.max_objs)
    labels0 = np.argmax(init_mask[0], axis=-1).astype(np.uint8)
    inj_mask = np.zeros((H, W), np.uint8)
    inj_mask[5:25, 5:30] = 3

    live = StreamingSession(cfg, variables, raw_hw=(H, W), in_size=(H, W),
                            out_size=(H, W), seed=0)
    live.start(frames[0, 0], labels0)
    want = [live.push(frames[1, 0]), live.push(frames[2, 0]),
            live.add_objects(frames[3, 0], inj_mask, [3]),
            live.push(frames[4, 0]), live.push(frames[5, 0])]

    sess = ExportedSession(inj_artifact)
    sess.warmup()
    sess.start(frames[0, 0], labels0)
    got = [sess.push(frames[1, 0]), sess.push(frames[2, 0]),
           sess.add_objects(frames[3, 0], inj_mask, [3]),
           sess.push(frames[4, 0]), sess.push(frames[5, 0])]
    assert sess.frames_seen == 6
    np.testing.assert_array_equal(np.stack(got), np.stack(want))
    assert (got[2] == 3).sum() > 0


def test_exported_session_out_of_budget_labels_drop_to_background(
        tiny, inj_artifact):
    """start()'s one-hot must clip out-of-budget ids to BACKGROUND (the
    to_onehot contract) — not emit all-zero pixel vectors."""
    from swem_tpu.io.export import ExportedSession

    cfg, model, variables = tiny
    H, W = 64, 96
    frames, _, _ = _video(3, H, W, cfg.max_objs)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    labels[40:60, 60:90] = cfg.max_objs + 2  # beyond the slot budget

    sess = ExportedSession(inj_artifact)
    sess.start(frames[0, 0], labels)
    got = [sess.push(f[0]) for f in frames[1:]]

    clipped = np.where(labels <= cfg.max_objs, labels, 0).astype(np.uint8)
    ref = ExportedSession(inj_artifact)
    ref.start(frames[0, 0], clipped)
    want = [ref.push(f[0]) for f in frames[1:]]
    np.testing.assert_array_equal(np.stack(got), np.stack(want))


def test_exported_session_add_objects_needs_injectable(tiny, tmp_path):
    from swem_tpu.io.export import ExportedSession

    cfg, model, variables = tiny
    path = str(tmp_path / "plain")
    export_runner(model, variables, path, frame_hw=(64, 96), chunk=2,
                  platforms=("cpu",))
    frames, init_mask, active = _video(2, 64, 96, cfg.max_objs)
    with pytest.raises(ValueError):
        ExportedRunner(path)(frames, init_mask, active,
                             injections={1: (None, None)})
    sess = ExportedSession(path)
    sess.start(frames[0, 0], np.argmax(init_mask[0], -1).astype(np.uint8))
    with pytest.raises(ValueError):
        sess.add_objects(frames[1, 0], np.zeros((64, 96), np.uint8), [1])


def test_export_chunk1_dedupes_sizes(tiny, tmp_path):
    """chunk=1's ladder is [1] again: one program, one manifest entry."""
    cfg, model, variables = tiny
    path = str(tmp_path / "c1")
    export_runner(model, variables, path, frame_hw=(64, 96), chunk=1,
                  platforms=("cpu",))
    with open(os.path.join(path, "manifest.json")) as f:
        m = json.load(f)
    assert m["sizes"] == [1]
    frames, init_mask, active = _video(4, 64, 96, cfg.max_objs)
    preds = ExportedRunner(path)(frames, init_mask, active)
    assert preds.shape == (3, 1, 64, 96)


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
