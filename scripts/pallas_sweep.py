#!/usr/bin/env python
"""Pallas-vs-XLA sweep over the reference's true shape grid.

Round-2 measured both fused kernels (ops/em_pallas.py EM loop, ops/
read_pallas.py fused read) slower than XLA at the benchmarked flagship
shapes (L=128, N=2, P=1620) — but never at the reference's own config
default ``NUM_BASES = 256`` (/root/reference/configs/config.py:59; the CLI
default is 128, train.py:81-82) or the YTVOS 12-slot budget, where the
packed GEMMs are 2-6x larger. This script closes that axis: it times both
kernels against the XLA path across L x slots x P and prints a decision
table (VERDICT r2 item 2).

Timing method (CLAUDE.md): per-dispatch tunnel latency is ~25-40 ms on the
dev box, so each op is looped inside ONE jitted ``lax.scan`` (the carry
serializes iterations) and the total is divided by the trip count.

Run on the TPU chip:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/pallas_sweep.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])  # tiny materialize = sync


def time_scanned(build_body, carry, iters, reps=3):
    """Median seconds per iteration of body, serialized through a scan."""

    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (build_body(c), None), c, None,
                            length=iters)[0]

    out = run(carry)
    _sync(out)  # compile + load
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(carry)
        _sync(out)
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


def bench_em(L, N, P, Ck=128, Cv=512, iters=30):
    from swem_tpu.models import em

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, P, Ck)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((1, N, P, Cv)).astype(np.float32))
    fg = (rng.random((1, N, P)) > 0.5).astype(np.float32)
    masks = jnp.asarray(np.stack([1 - fg, fg], axis=2))
    bases = em.init_bases(jax.random.PRNGKey(0), 1, N, Ck, Cv, L)

    def body(use_pallas):
        def f(b):
            return em.em_update(x, v, masks, b, n_iters=4, tau=0.05,
                                use_pallas=use_pallas)
        return f

    t_xla = time_scanned(body(False), bases, iters)
    t_pal = time_scanned(body(True), bases, iters)
    return t_xla, t_pal


def bench_read(L, N, P, Ck=128, Cv=512, topl=64, iters=30):
    from swem_tpu.models import em

    Lm = 2 * L  # both banks
    rng = np.random.default_rng(1)
    qk = jnp.asarray(rng.standard_normal((1, P, Ck)).astype(np.float32))
    mk = jnp.asarray(rng.standard_normal((1, N, 2, Ck, Lm)).astype(np.float32))
    mv = jnp.asarray(rng.standard_normal((1, N, 2, Cv, Lm)).astype(np.float32))
    valid = jnp.ones((1, N, 2, Lm), bool)
    tl = min(topl, L)

    def body(use_pallas):
        def f(q):
            out, S = em.read_memory(q, mk, mv, valid, tau=0.05, topl=tl,
                                    use_pallas=use_pallas)
            # serialize without changing values measurably
            return q + 1e-30 * (jnp.mean(out) + jnp.mean(S))
        return f

    t_xla = time_scanned(body(False), qk, iters)
    t_pal = time_scanned(body(True), qk, iters)
    return t_xla, t_pal


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--out", default=None, help="optional JSON output path")
    p.add_argument("--grid", default=None,
                   help="semicolon-separated L,N,P triples (default: full grid)")
    p.add_argument("--row_timeout", type=int, default=900,
                   help="seconds per (L,N,P) row before it is skipped — the "
                        "remote compiler has been seen to wedge on single "
                        "pathological shapes")
    args = p.parse_args()

    if args.grid:
        grid = [tuple(int(v) for v in row.split(","))
                for row in args.grid.split(";") if row]
    else:
        grid = []
        # P = 576 (384² train crop /16), 1620 (480x864 eval /16);
        # N covers the eval slot buckets {2, 4, 8} + the YTVOS cap 12
        for L in (128, 256):
            for N in (2, 4, 8, 12):
                for P in (576, 1620):
                    grid.append((L, N, P))

    import signal

    class RowTimeout(Exception):
        pass

    def _alarm(signum, frame):
        raise RowTimeout()

    signal.signal(signal.SIGALRM, _alarm)

    rows = []
    print(f"{'L':>4} {'N':>3} {'P':>5} | {'em_xla':>8} {'em_pal':>8} {'ratio':>6} "
          f"| {'rd_xla':>8} {'rd_pal':>8} {'ratio':>6}", flush=True)
    for L, N, P in grid:
        signal.alarm(args.row_timeout)
        try:
            ex, ep = bench_em(L, N, P, iters=args.iters)
        except Exception as e:  # VMEM overflow, wedged remote compile, etc.
            ex, ep = float("nan"), float("nan")
            print(f"em {L},{N},{P} failed: {type(e).__name__}: {e}"[:200],
                  flush=True)
        signal.alarm(args.row_timeout)
        try:
            rx, rp = bench_read(L, N, P, iters=args.iters)
        except Exception as e:
            rx, rp = float("nan"), float("nan")
            print(f"read {L},{N},{P} failed: {type(e).__name__}: {e}"[:200],
                  flush=True)
        signal.alarm(0)
        rows.append(dict(L=L, N=N, P=P, em_xla_ms=ex * 1e3, em_pallas_ms=ep * 1e3,
                         read_xla_ms=rx * 1e3, read_pallas_ms=rp * 1e3))
        print(f"{L:>4} {N:>3} {P:>5} | {ex*1e3:8.3f} {ep*1e3:8.3f} "
              f"{(ep/ex if ex else float('nan')):6.2f} "
              f"| {rx*1e3:8.3f} {rp*1e3:8.3f} "
              f"{(rp/rx if rx else float('nan')):6.2f}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
