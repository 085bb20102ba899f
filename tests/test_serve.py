"""Streaming-session (online serving) tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swem_tpu.config import ModelConfig
from swem_tpu.models.swem import SWEM
from swem_tpu.serve import StreamingSession


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
    return cfg, variables


def test_stream_matches_offline_engine(tiny):
    """push()-by-push() == the offline per-frame step path."""
    from swem_tpu.engine import init_memory, step

    cfg, variables = tiny
    model = SWEM(cfg)
    rng = np.random.default_rng(0)
    T, H, W = 4, 64, 96
    frames_u8 = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    labels[40:60, 60:90] = 2

    sess = StreamingSession(cfg, variables, raw_hw=(H, W), in_size=(H, W),
                            out_size=(H, W), seed=0)
    sess.warmup()
    sess.start(frames_u8[0], labels)
    stream_preds = [sess.push(f) for f in frames_u8[1:]]
    assert sess.frames_seen == T

    onehot = (labels[..., None] == np.arange(cfg.max_objs + 1)).astype(np.float32)
    active = np.zeros((1, cfg.max_objs), bool)
    active[0, :2] = True
    fr = jnp.asarray(frames_u8.astype(np.float32) / 255.0)
    mem = init_memory(model, variables, jax.random.PRNGKey(0), fr[0][None],
                      jnp.asarray(onehot[None]), jnp.asarray(active))
    for t in range(1, T):
        mem, pred, _ = step(model, variables, mem, fr[t][None],
                            jnp.asarray(active), (H, W), do_memorize=True)
        np.testing.assert_array_equal(stream_preds[t - 1], np.asarray(pred[0]))


def test_stream_mid_injection(tiny):
    """add_objects grows the active set and later frames may predict it."""
    cfg, variables = tiny
    rng = np.random.default_rng(1)
    H, W = 64, 96
    frames_u8 = (rng.random((5, H, W, 3)) * 255).astype(np.uint8)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1

    sess = StreamingSession(cfg, variables, raw_hw=(H, W), in_size=(H, W),
                            out_size=(H, W))
    sess.start(frames_u8[0], labels)
    sess.push(frames_u8[1])
    inj = np.zeros((H, W), np.uint8)
    inj[40:60, 60:90] = 3
    pred = sess.add_objects(frames_u8[2], inj, [3])
    assert (pred == 3).sum() > 0  # injected GT overwrites the prediction
    p3 = sess.push(frames_u8[3])
    assert p3.shape == (H, W) and p3.dtype == np.uint8
    assert set(np.unique(p3)) <= set(range(cfg.max_objs + 1))


def test_stream_resize_path(tiny):
    """raw_hw != in_size exercises the on-device bicubic preprocess."""
    cfg, variables = tiny
    rng = np.random.default_rng(2)
    H, W = 64, 96
    raw = (rng.random((2, 80, 120, 3)) * 255).astype(np.uint8)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    sess = StreamingSession(cfg, variables, raw_hw=(80, 120), in_size=(H, W),
                            out_size=(H, W))
    sess.start(raw[0], labels)
    pred = sess.push(raw[1])
    assert pred.shape == (H, W)


def test_measure_latency_contract(tiny):
    """measure_latency returns the requested percentiles + mean, in ms,
    over one push per frame (warmup + start excluded from the timings)."""
    from swem_tpu.serve import measure_latency

    cfg, variables = tiny
    rng = np.random.default_rng(3)
    H, W = 64, 96
    frames = (rng.random((5, H, W, 3)) * 255).astype(np.uint8)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    sess = StreamingSession(cfg, variables, raw_hw=(H, W), in_size=(H, W),
                            out_size=(H, W))
    out = measure_latency(sess, frames[0], labels, frames[1:],
                          percentiles=(50, 95))
    assert set(out) == {"p50", "p95", "mean"}
    assert 0 < out["p50"] <= out["p95"]
    assert sess.frames_seen == 5


def test_measure_device_latency_raises_without_device_lane(tiny):
    """On backends whose profiler trace has no device 'XLA Modules' lane
    (CPU here), the device-latency helper must raise rather than report 0 —
    bench.py catches this and keeps the wall numbers."""
    from swem_tpu.serve import measure_device_latency

    cfg, variables = tiny
    rng = np.random.default_rng(4)
    H, W = 64, 96
    frames = (rng.random((3, H, W, 3)) * 255).astype(np.uint8)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    sess = StreamingSession(cfg, variables, raw_hw=(H, W), in_size=(H, W),
                            out_size=(H, W))
    with pytest.raises(RuntimeError, match="XLA Modules"):
        measure_device_latency(sess, frames[0], labels, frames[1:])


def test_grow_without_injection_is_exact_noop(tiny):
    """grow() alone must not change the stream: carried bases are
    bit-identical and the padded inactive slots are exact no-ops (the
    tests/test_em.py invariant, exercised end-to-end through the conv
    towers + aggregation)."""
    cfg, variables = tiny
    rng = np.random.default_rng(11)
    T, H, W = 6, 64, 96
    frames_u8 = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    labels[40:60, 60:90] = 2

    import dataclasses
    small = dataclasses.replace(cfg, max_objs=2)

    base = StreamingSession(small, variables, raw_hw=(H, W), in_size=(H, W),
                            out_size=(H, W), seed=0)
    base.start(frames_u8[0], labels)
    base.push(frames_u8[1])
    want = [base.push(f) for f in frames_u8[2:]]

    grown = StreamingSession(small, variables, raw_hw=(H, W), in_size=(H, W),
                             out_size=(H, W), seed=0)
    grown.start(frames_u8[0], labels)
    grown.push(frames_u8[1])
    grown.grow(4)
    assert grown.n_slots == 4
    got = [grown.push(f) for f in frames_u8[2:]]
    for w_, g in zip(want, got):
        np.testing.assert_array_equal(w_, g)


def test_grow_then_inject_matches_scratch_big(tiny):
    """grow(4)+inject ~ a from-scratch 4-slot session on the same history:
    not bit-equal (new slots' random EM warm-start differs — it washes out
    against real data, engine.py::init_memory), but pixel disagreement must
    stay tiny, and the injected object must persist."""
    cfg, variables = tiny
    rng = np.random.default_rng(12)
    T, H, W = 6, 64, 96
    frames_u8 = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    inj = np.zeros((H, W), np.uint8)
    inj[40:60, 60:90] = 2

    import dataclasses

    def run(n_start):
        sess = StreamingSession(dataclasses.replace(cfg, max_objs=n_start),
                                variables, raw_hw=(H, W), in_size=(H, W),
                                out_size=(H, W), seed=0)
        sess.start(frames_u8[0], labels)
        sess.push(frames_u8[1])
        if n_start < 4:
            sess.grow(4)
        preds = [sess.add_objects(frames_u8[2], inj, [2])]
        preds += [sess.push(f) for f in frames_u8[3:]]
        return np.stack(preds)

    got = run(2)   # grown mid-stream
    want = run(4)  # from scratch at the big budget
    assert (got == 2).any(axis=(1, 2)).all(), "injected object lost"
    assert (got != want).mean() < 1e-2


def test_grow_under_obj_mesh(tiny):
    """grow() composes with the obj mesh: sharded memory pads + re-shards,
    divisibility is enforced, and the grown sharded stream matches the
    grown local stream."""
    from swem_tpu.parallel import make_mesh2

    cfg, variables = tiny
    rng = np.random.default_rng(14)
    T, H, W = 5, 64, 96
    frames_u8 = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    inj = np.zeros((H, W), np.uint8)
    inj[40:60, 60:90] = 2

    import dataclasses
    small = dataclasses.replace(cfg, max_objs=2)

    def run(mesh):
        sess = StreamingSession(small, variables, raw_hw=(H, W),
                                in_size=(H, W), out_size=(H, W), seed=0,
                                mesh=mesh)
        sess.start(frames_u8[0], labels)
        sess.push(frames_u8[1])
        sess.grow(4)
        preds = [sess.add_objects(frames_u8[2], inj, [2]),
                 sess.push(frames_u8[3]), sess.push(frames_u8[4])]
        return sess, np.stack(preds)

    _, want = run(None)
    sess, got = run(make_mesh2(n_data=1, n_obj=2))
    # per-device partitioning can flip f32 argmax ties on a few pixels
    assert (got != want).mean() < 1e-3
    with pytest.raises(ValueError, match="divisible"):
        sess.grow(5)


def test_prepare_grow_matches_inline_grow(tiny):
    """prepare_grow pre-compiles on a background thread; the later grow()
    must produce the identical stream (same programs, same memory pad —
    bit-equal to the inline-grow path), and a mismatched prepared budget
    falls back to the inline build."""
    cfg, variables = tiny
    rng = np.random.default_rng(15)
    T, H, W = 5, 64, 96
    frames_u8 = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    inj = np.zeros((H, W), np.uint8)
    inj[40:60, 60:90] = 2

    import dataclasses
    small = dataclasses.replace(cfg, max_objs=2)

    def run(prepare, grow_to=4):
        sess = StreamingSession(small, variables, raw_hw=(H, W),
                                in_size=(H, W), out_size=(H, W), seed=0)
        sess.start(frames_u8[0], labels)
        if prepare is not None:
            sess.prepare_grow(prepare)
        sess.push(frames_u8[1])
        sess.grow(grow_to)
        preds = [sess.add_objects(frames_u8[2], inj, [2]),
                 sess.push(frames_u8[3]), sess.push(frames_u8[4])]
        return np.stack(preds)

    want = run(prepare=None)
    np.testing.assert_array_equal(run(prepare=4), want)
    # prepared-for-8 but grown-to-4: inline fallback, same stream
    np.testing.assert_array_equal(run(prepare=8), want)


def test_grow_rejects_shrink(tiny):
    cfg, variables = tiny
    rng = np.random.default_rng(13)
    H, W = 64, 96
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    sess = StreamingSession(cfg, variables, raw_hw=(H, W), in_size=(H, W),
                            out_size=(H, W))
    sess.start((rng.random((H, W, 3)) * 255).astype(np.uint8), labels)
    with pytest.raises(ValueError, match="shrink"):
        sess.grow(2)


def test_stream_obj_parallel_matches_local(tiny):
    """A mesh with an 'obj' axis splits the session's per-object towers
    over devices (the single-stream latency win — batch=1 has no data
    axis); predictions must match the unsharded session, including through
    a mid-stream injection, and with COMMITTED variables (the checkpoint-
    restore placement)."""
    from swem_tpu.parallel import make_mesh2

    cfg, variables = tiny
    rng = np.random.default_rng(7)
    T, H, W = 5, 64, 96
    frames_u8 = (rng.random((T, H, W, 3)) * 255).astype(np.uint8)
    labels = np.zeros((H, W), np.uint8)
    labels[10:30, 20:50] = 1
    labels[40:60, 60:90] = 2
    inj = np.zeros((H, W), np.uint8)
    inj[5:20, 5:20] = 3

    def run(mesh, v):
        sess = StreamingSession(cfg, v, raw_hw=(H, W), in_size=(H, W),
                                out_size=(H, W), seed=0, mesh=mesh)
        sess.start(frames_u8[0], labels)
        preds = [sess.push(frames_u8[1]),
                 sess.add_objects(frames_u8[2], inj, [3]),
                 sess.push(frames_u8[3]), sess.push(frames_u8[4])]
        return np.stack(preds)

    want = run(None, variables)
    committed = jax.device_put(variables, jax.devices()[0])
    got = run(make_mesh2(n_data=1, n_obj=4), committed)
    assert got.shape == want.shape
    # per-device partitioning can flip f32 argmax ties on a few pixels
    assert (got != want).mean() < 1e-3
