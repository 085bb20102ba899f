"""Headline benchmark: SWEM 480p video-object-segmentation inference FPS.

Measures the flagship model (ResNet-50, keydim 128, valdim 512, L=128,
topl 64, 2 objects) on synthetic 480p video in two ways:

* ``scan_fps`` — the whole-video single-program ``lax.scan`` with a
  checksum sync and no bulk host transfers in the timed span. This MATCHES
  the reference's FPS semantics: basic_evaluator.py:160-171 moves the
  video to the GPU and resizes it BEFORE ``fps.tic``, and predictions move
  to the CPU only after ``fps.toc`` — both bulk transfers sit outside the
  reference's timed span too. The headline ``value``/``vs_baseline`` use
  this number.
* ``runner_fps`` — the PRODUCTION evaluation path: a DAVIS-typical-length
  T=69 uint8 host video through ``ChunkedVideoRunner`` (chunk=16 scans +
  exact binary-ladder tail + traced final-frame memorize skip), preprocess
  fused on device, per-chunk frame uploads AND the uint8 prediction
  fetches INSIDE the timed span — stricter than the reference's
  semantics. On a real TPU host the ~56 MB of PCIe traffic costs
  milliseconds and runner_fps ~= scan_fps; on THIS dev box the tunneled
  device link (~10 MB/s effective) makes it transfer-bound
  (10.8 FPS measured vs 121.9 compute — see CLAUDE.md), which measures
  the tunnel, not the framework.
* ``runner_device_fps`` — the tunnel-independent production number: one
  traced runner pass, frames divided by the summed device execution time
  of its programs (profiler "XLA Modules" lane,
  utils/profiling.py::device_seconds_from_trace). This is what the
  production path would run at if host<->device transfers were free —
  the upper bound a real PCIe host approaches.

* ``serve_latency_ms`` — online serving: device-only per-frame time of one
  ``StreamingSession.push`` at flagship dims (profiler module lane over 24
  pushes). ``serve_wall_p50/p95_ms`` are the wall percentiles under the
  serving contract (each push materializes its mask on host) — on this dev
  box they measure the tunneled link, not the model (PARITY.md "Beyond the
  reference: serving").

FPS counts everything the reference counts: per-frame encode, memory read,
decode, argmax, value encode, EM memorize (utils/logger.py:87-108
semantics: wall-clock over whole-video inference, excluding PNG I/O).

Baseline: the SWEM paper reports ~36 FPS at 480p on a V100 (the repo itself
publishes no numbers — BASELINE.md); vs_baseline = scan_fps / 36.

Prints exactly one JSON line.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def bench_scan(model, variables, cfg, Ho, Wo):
    from swem_tpu.engine import run_video

    T, B, H, W = 30, 1, 480, 864
    rng = np.random.default_rng(0)
    frames_np = rng.random((T, B, H, W, 3)).astype(np.float32)
    init_mask = np.zeros((B, Ho, Wo, cfg.max_objs + 1), np.float32)
    init_mask[..., 0] = 1.0
    init_mask[:, 100:220, 150:330, 1] = 1.0
    init_mask[:, 100:220, 150:330, 0] = 0.0
    init_mask[:, 260:400, 500:700, 2] = 1.0
    init_mask[:, 260:400, 500:700, 0] = 0.0
    init_mask = jnp.asarray(init_mask)
    active = jnp.ones((B, cfg.max_objs), bool)
    frames = jnp.asarray(frames_np)

    @jax.jit
    def run(variables, rng, frames, init_mask, active):
        preds = run_video(model, variables, rng, frames, init_mask, active, (Ho, Wo))
        # tiny checksum output: materializing it synchronizes the whole
        # program without shipping the 40MB prediction stack across the
        # host link (the reference's FPS also excludes the device->host
        # copy: preds move to CPU only after fps.toc,
        # basic_evaluator.py:171-177)
        return preds, jnp.sum(preds.astype(jnp.int32))

    rng = jax.random.PRNGKey(1)
    preds, chk = run(variables, rng, frames, init_mask, active)
    _ = int(np.asarray(chk))  # compile + warmup sync

    # per-run input perturbations are materialized OUTSIDE the timed span:
    # an eager `frames + eps` between tic and run adds a full host<->device
    # tunnel round trip (~25 ms here) that has nothing to do with model
    # throughput
    variants = []
    for i in range(5):
        v = frames + 0.0001 * i
        np.asarray(v[0, 0, 0, 0])
        variants.append(v)

    fps_runs = []
    for v in variants:
        t0 = time.perf_counter()
        preds, chk = run(variables, rng, v, init_mask, active)
        _ = int(np.asarray(chk))
        dt = time.perf_counter() - t0
        # the reference counts all T frames for the same timed span
        # (fps.toc(frame_n), basic_evaluator.py:176)
        fps_runs.append(T / dt)
    out = np.asarray(preds)
    assert out.shape == (T - 1, B, Ho, Wo)
    return float(np.median(fps_runs))


def bench_runner(model, variables, cfg, Ho, Wo):
    """Production path: ChunkedVideoRunner on a T=69 uint8 host video."""
    from swem_tpu.engine import ChunkedVideoRunner
    from swem_tpu.ops.resize import resize

    T, B = 69, 1  # DAVIS-typical length, NOT a chunk multiple (16*4 + 4 + 1)
    rng = np.random.default_rng(1)
    frames = (rng.random((T, B, Ho, Wo, 3)) * 255).astype(np.uint8)
    init_mask = np.zeros((B, Ho, Wo, cfg.max_objs + 1), np.float32)
    init_mask[..., 0] = 1.0
    init_mask[:, 100:220, 150:330, 1] = 1.0
    init_mask[:, 100:220, 150:330, 0] = 0.0
    init_mask[:, 260:400, 500:700, 2] = 1.0
    init_mask[:, 260:400, 500:700, 0] = 0.0
    active = np.ones((B, cfg.max_objs), bool)

    pre = lambda f: resize(f.astype(jnp.float32) / 255.0, (480, 864), "bicubic")
    runner = ChunkedVideoRunner(model, (Ho, Wo), chunk=16, preprocess=pre)
    runner.warmup(variables, (Ho, Wo), B, cfg.max_objs, frame_dtype=jnp.uint8)

    key = jax.random.PRNGKey(1)
    fps_runs = []
    for _ in range(4):
        t0 = time.perf_counter()
        preds = runner(variables, key, frames, jnp.asarray(init_mask),
                       jnp.asarray(active))
        dt = time.perf_counter() - t0
        fps_runs.append(T / dt)
    assert preds.shape == (T - 1, B, Ho, Wo) and preds.dtype == np.uint8

    # tunnel-independent production FPS: trace one full runner pass and sum
    # the device "XLA Modules" lane — the time the CHIP spent executing the
    # init + chunk + ladder programs, excluding host work and transfers.
    # On a real PCIe TPU host runner_fps approaches this number; on the
    # tunneled dev box runner_fps measures the link instead (CLAUDE.md).
    import shutil
    import tempfile

    from swem_tpu.utils.profiling import device_seconds_from_trace

    trace_dir = tempfile.mkdtemp(prefix="bench_runner_trace_")
    try:
        with jax.profiler.trace(trace_dir):
            preds = runner(variables, key, frames, jnp.asarray(init_mask),
                           jnp.asarray(active))
        device_fps = float(T / device_seconds_from_trace(trace_dir))
    except Exception as e:  # noqa: BLE001 — a bad/renamed/truncated trace
        # must not lose the wall-clock numbers measured above
        print(f"runner_device_fps unavailable: {e}", file=sys.stderr)
        device_fps = None
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    return float(np.median(fps_runs)), device_fps


def bench_serve(cfg, variables, Ho, Wo):
    """Online serving latency: StreamingSession at flagship dims.

    Wall percentiles follow the serving contract (each push materializes
    its uint8 mask on host before the next frame); ``device_ms`` is the
    profiler-derived chip-only per-frame time (``runner_device_fps``
    technique) — the latency floor a colocated host approaches. On this
    dev box the wall numbers include the tunneled device link and measure
    the link; device_ms is the tunnel-independent serving number.
    """
    from swem_tpu.serve import (StreamingSession, measure_device_latency,
                                measure_latency)

    T = 24
    rng = np.random.default_rng(2)
    frames = (rng.random((T, Ho, Wo, 3)) * 255).astype(np.uint8)
    frame0 = (rng.random((Ho, Wo, 3)) * 255).astype(np.uint8)
    init_mask = np.zeros((Ho, Wo), np.uint8)
    init_mask[100:220, 150:330] = 1
    init_mask[260:400, 500:700] = 2

    session = StreamingSession(
        cfg, variables, raw_hw=(Ho, Wo), in_size=(480, 864),
        out_size=(Ho, Wo))
    wall = measure_latency(session, frame0, init_mask, frames,
                           percentiles=(50, 95))
    try:
        device_ms = measure_device_latency(session, frame0, init_mask, frames)
    except Exception as e:  # noqa: BLE001 — a bad trace must not lose wall
        print(f"serve device latency unavailable: {e}", file=sys.stderr)
        device_ms = None
    return wall, device_ms


def main():
    import argparse

    from swem_tpu.config import ModelConfig
    from swem_tpu.models.swem import SWEM

    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="conv-tower compute dtype; the headline is bf16, "
                         "--dtype float32 records the worst-case precision-"
                         "retreat number (PARITY.md, ~6 min compile)")
    ap.add_argument("--skip_serve", action="store_true")
    args = ap.parse_args()

    cfg = ModelConfig(dtype=args.dtype)
    model = SWEM(cfg)
    Ho, Wo = 480, 854

    rng = np.random.default_rng(0)
    f0 = jnp.asarray(rng.random((1, 480, 864, 3)).astype(np.float32))
    m0 = np.zeros((1, Ho, Wo, cfg.max_objs + 1), np.float32)
    m0[..., 0] = 1.0
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), f0, jnp.asarray(m0))

    scan_fps = bench_scan(model, variables, cfg, Ho, Wo)
    runner_fps, runner_device_fps = bench_runner(model, variables, cfg, Ho, Wo)
    serve_wall, serve_device_ms = (None, None) if args.skip_serve else \
        bench_serve(cfg, variables, Ho, Wo)

    baseline_fps = 36.0  # SWEM paper, 480p on V100
    out = {
        "metric": "swem_480p_inference_fps",
        "value": round(scan_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(scan_fps / baseline_fps, 3),
        "scan_fps": round(scan_fps, 2),
        "runner_fps": round(runner_fps, 2),
    }
    if runner_device_fps is not None:
        out["runner_device_fps"] = round(runner_device_fps, 2)
    if serve_device_ms is not None:
        # the serving latency number: chip-only per-frame time of the
        # streaming push program (see bench_serve)
        out["serve_latency_ms"] = round(serve_device_ms, 2)
    if serve_wall is not None:
        out["serve_wall_p50_ms"] = round(serve_wall["p50"], 1)
        out["serve_wall_p95_ms"] = round(serve_wall["p95"], 1)
    if args.dtype != "bfloat16":
        out["dtype"] = args.dtype
    print(json.dumps(out))


if __name__ == "__main__":
    main()
