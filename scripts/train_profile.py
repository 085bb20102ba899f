#!/usr/bin/env python
"""Op-level profile of the flagship train step (one TPU chip).

Jits the production train step at the S3 configuration (bs8, 384², T=3,
bf16 towers), warms up, traces K steps with jax.profiler, then parses the
vm.trace.json.gz (CLAUDE.md recipe) and prints total device time summed by
fusion/op name — the map from step-ms to actual HLO hotspots.

Run:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/train_profile.py
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from train_bench import make_host_batch  # noqa: E402 (scripts/ sibling)


def parse_trace(trace_dir):
    from swem_tpu.utils.profiling import load_latest_trace

    data = load_latest_trace(trace_dir)
    by_name = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        # keep only device lanes (XLA ops); skip host-side python/runtime
        name = ev.get("name", "")
        args = ev.get("args") or {}
        if "run_id" not in args and "tf_op" not in args and not name.startswith(
                ("fusion", "convolution", "copy", "loop_", "wide.", "custom-call",
                 "dot", "transpose", "bitcast", "reduce", "scatter", "select",
                 "dynamic", "broadcast", "concatenate", "slice", "rng",
                 "all-reduce", "add", "multiply", "iota", "constant", "pad",
                 "reshape", "convert", "compare", "tuple", "get-tuple",
                 "exponential", "divide", "subtract", "maximum", "minimum")):
            continue
        by_name[name] += ev["dur"]
        counts[name] += 1
        total += ev["dur"]
    return by_name, counts, total


def map_fusions(hlo_text, names):
    """Summarize the HLO bodies behind trace fusion/op names.

    The profiler's lane names are the compiled module's instruction names
    (fusion.68, convolution_add_fusion.3, ...). For each requested name,
    find its definition line (output shape, fusion kind, called
    computation) and summarize the called computation's body: convolution/
    dot lines verbatim (the FLOPs) plus an opcode histogram of the rest.
    """
    import re

    # instruction definitions: "  %fusion.68 = shape fusion(...), kind=..., calls=%comp"
    defs = {}
    for m in re.finditer(r"^\s*(?:ROOT )?%?([\w.-]+) = ([^\n]+)$", hlo_text, re.M):
        defs[m.group(1)] = m.group(2)
    # computation bodies: "%comp (params) -> type {" ... "}"; params may be
    # tuple-typed (nested parens), so anchor on the " -> " arrow instead of
    # a paren-free parameter list
    bodies = {}
    for m in re.finditer(r"^%?([\w.-]+) \(.*\) -> .+\{$", hlo_text, re.M):
        start = m.end()
        end = hlo_text.find("\n}", start)
        if end == -1:  # last computation in the module: no further "\n}"
            end = len(hlo_text)
        bodies[m.group(1)] = hlo_text[start:end]
    for name in names:
        d = defs.get(name)
        print(f"\n== {name} ==")
        if d is None:
            print("  (no definition found in HLO text)")
            continue
        print(f"  def: {d[:200]}")
        cm = re.search(r"calls=%?([\w.-]+)", d)
        body = bodies.get(cm.group(1)) if cm else None
        if body is None:
            continue
        hist = defaultdict(int)
        for line in body.splitlines():
            line = line.strip()
            m2 = re.match(r"(?:ROOT )?%?[\w.-]+ = \S+ ([a-z-]+)\(", line)
            if not m2:
                continue
            op = m2.group(1)
            if op in ("convolution", "dot"):
                print(f"  {line[:200]}")
            hist[op] += 1
        print("  ops:", dict(sorted(hist.items(), key=lambda kv: -kv[1])))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--trace_dir", default="/tmp/train_trace")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--map_top", type=int, default=0,
                   help="also lower+compile the step and print the HLO "
                        "bodies of the top-N trace entries (what the "
                        "fusion.NN names actually compute)")
    args = p.parse_args()

    from swem_tpu.config import (LossConfig, ModelConfig, SolverConfig,
                                 SWEMConfig)
    from swem_tpu.models.swem import SWEM
    from swem_tpu.train import (create_train_state, make_optimizer,
                                make_train_step)

    model_cfg = ModelConfig(dtype="bfloat16")
    cfg = SWEMConfig(model=model_cfg, solver=SolverConfig(), loss=LossConfig())
    model = SWEM(model_cfg)
    tx, _ = make_optimizer(cfg.solver)

    rng = np.random.default_rng(0)
    batch_np = make_host_batch(rng, B=args.batch)
    state = create_train_state(
        model, jax.random.PRNGKey(0), tx,
        jnp.asarray(batch_np["frames"][:1, 0]),
        jnp.asarray(batch_np["masks"][:1, 0]),
    )
    batch = jax.device_put({k: jnp.asarray(v) for k, v in batch_np.items()})
    step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    print("compiling + warmup ...", flush=True)
    state, metrics = step(state, batch, key)
    print("warmup loss:", float(metrics["total_loss"]), flush=True)

    import time
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch, key)
    _ = float(metrics["total_loss"])  # materialize = sync (CLAUDE.md)
    wall = (time.perf_counter() - t0) / args.steps * 1e3
    print(f"steady-state step: {wall:.1f} ms", flush=True)

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            state, metrics = step(state, batch, key)
        _ = float(metrics["total_loss"])

    by_name, counts, total = parse_trace(args.trace_dir)
    per_step = total / args.steps / 1e3
    print(f"\ndevice total: {per_step:.1f} ms/step over {args.steps} steps")
    print(f"{'ms/step':>9} {'%':>5} {'n':>5}  name")
    ranked = sorted(by_name.items(), key=lambda kv: -kv[1])
    for name, dur in ranked[: args.top]:
        print(f"{dur / args.steps / 1e3:9.3f} {100 * dur / total:5.1f} "
              f"{counts[name] // args.steps:5d}  {name[:110]}")

    if args.map_top:
        print("\nlowering + compiling for HLO mapping ...", flush=True)
        hlo = step.lower(state, batch, key).compile().as_text()
        names = [n for n, _ in ranked if not n.startswith("jit_")]
        map_fusions(hlo, names[: args.map_top])


if __name__ == "__main__":
    main()
