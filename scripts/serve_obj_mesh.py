"""Does StreamingSession(mesh=obj) lower per-frame latency? An honest
accounting on virtual devices.

serve.py:63-65 claims a mesh with an 'obj' axis lowers single-stream
per-frame latency by splitting the per-object conv towers across chips.
Real multi-chip hardware is not available in this environment and CPU
virtual devices share one core (wall-clock comparisons there measure
nothing), so this script quantifies the claim the way the roofline
scripts do — from the compiled programs themselves:

* lower + compile the streaming ``step`` program local and on a
  (1 data x K obj) mesh over K virtual CPU devices;
* per-device FLOPs / bytes from XLA ``cost_analysis`` (the partitioned
  module's numbers — what one chip executes per frame);
* every collective in the sharded HLO, with element counts -> bytes
  moved per frame, and an ICI time estimate at v5e link speed
  (~45 GB/s/link one-way, 2-device ring all-gather = one hop);
* both programs execute one frame to prove the sharded step runs.

Verdict from the recorded run (see PARITY.md "Beyond the reference:
serving"): at K=2 the per-device FLOPs nearly halve while the
all-gathers move ~a few MB/frame (~100 us ICI) — a real latency win at
flagship dims where the frame costs ~8.2 ms on a v5e chip, IF the
sharded towers keep their per-shape MXU efficiency (the B=1 small-op
floor documented in scripts/roofline.py says splitting N=2 objects into
N=1-per-chip towers keeps the same shapes as the already-measured
single-object towers).

Usage:  python scripts/serve_obj_mesh.py [--n_obj 2] [--size 480 864]
"""

from __future__ import annotations

import argparse
import re


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_obj", type=int, default=2)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 864),
                    help="inference H W (flagship 480p = 480 864)")
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--execute", action="store_true",
                    help="also run one frame through both programs")
    args = ap.parse_args()

    import __graft_entry__ as g
    g._force_virtual_cpu_devices(max(args.n_obj, 2))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from swem_tpu.config import ModelConfig
    from swem_tpu.models.swem import SWEM
    from swem_tpu.parallel import make_mesh2
    from swem_tpu.serve import StreamingSession

    H, W = args.size
    Ho, Wo = H, W - 10 if W > 64 else W  # out != in exercises the resize
    cfg = ModelConfig(backbone=args.backbone, max_objs=args.n_obj)
    model = SWEM(cfg)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, Ho, Wo, cfg.max_objs + 1)))

    frame = jnp.zeros((1, H, W, 3), jnp.uint8)
    active = jnp.ones((1, cfg.max_objs), bool)

    def build(mesh):
        sess = StreamingSession(cfg, variables, raw_hw=(H, W),
                                in_size=(H, W), out_size=(Ho, Wo), mesh=mesh)
        mem = sess._init(sess.variables, sess._rng, frame,
                         jnp.zeros((1, Ho, Wo, cfg.max_objs + 1)), active)
        lowered = sess._step.lower(sess.variables, mem, frame, active)
        compiled = lowered.compile()
        return sess, mem, compiled

    results = {}
    for name, mesh in [("local", None),
                       (f"obj{args.n_obj}",
                        make_mesh2(n_data=1, n_obj=args.n_obj))]:
        sess, mem, compiled = build(mesh)
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))
        hlo = compiled.as_text()
        colls = []
        for m in re.finditer(
                r"(\S+) = (\S+) (all-gather|all-reduce|collective-permute|"
                r"reduce-scatter|all-to-all)\(", hlo):
            shape, op = m.group(2), m.group(3)
            # shape like f32[1,2,30,54,512]{...} or a tuple
            elems = 0
            for t, dims in re.findall(r"(f32|bf16|f16|s32|u8|pred)\[([\d,]*)\]",
                                      shape):
                n = 1
                for d in filter(None, dims.split(",")):
                    n *= int(d)
                elems += n * {"f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                              "u8": 1, "pred": 1}[t]
            colls.append((op, shape, elems))
        coll_bytes = sum(c[2] for c in colls)
        results[name] = (flops, bytes_acc, colls, coll_bytes)
        print(f"== {name} ==")
        print(f"  per-device flops/frame:  {flops/1e9:.2f} GFLOP")
        print(f"  per-device bytes/frame:  {bytes_acc/1e6:.1f} MB")
        print(f"  collectives: {len(colls)}, {coll_bytes/1e6:.3f} MB/frame")
        for op, shape, b in colls:
            print(f"    {op:20s} {b/1e3:9.1f} kB  {shape[:60]}")
        if args.execute:
            out = sess._step(sess.variables, mem, frame, active)
            jax.block_until_ready(out)
            print("  executes: ok")

    fl_local = results["local"][0]
    key = f"obj{args.n_obj}"
    fl_obj, _, _, cb = results[key]
    ici_s = cb / 45e9  # v5e ~45 GB/s per ICI link one-way, 1 hop at K=2
    ratio = fl_obj / fl_local
    measured_ms = 8.17  # serve_latency_ms, BENCH_r05 flagship bf16
    est_ms = ratio * measured_ms + ici_s * 1e3
    print(f"\nper-device FLOPs ratio obj/local: {ratio:.3f} "
          f"(ideal {1/args.n_obj:.3f})")
    print(f"collective traffic: {cb/1e6:.3f} MB/frame ≈ {ici_s*1e6:.0f} us "
          f"on v5e ICI (~45 GB/s/link)")
    print(f"analytic latency bound at flagship dims: {ratio:.2f} x "
          f"{measured_ms} ms + {ici_s*1e3:.2f} ms ICI ≈ {est_ms:.1f} ms/frame"
          f" ({measured_ms/est_ms:.2f}x) — IF per-shape MXU efficiency holds"
          " (roofline.py B=1 floor: per-object towers keep their shapes when"
          " N shards, so it should). Unverified on real multi-chip hardware.")


if __name__ == "__main__":
    main()
