"""Device-side delta of YTVOS --video_batch: sequential (B=1 x4) vs
batched (B=4) injectable chunked runner at 480p, bucket 2, with one
mid-video injection per video (the YTVOS protocol shape)."""
import sys, shutil, tempfile
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from swem_tpu.config import ModelConfig
from swem_tpu.models.swem import SWEM
from swem_tpu.engine import ChunkedVideoRunner
from swem_tpu.ops.resize import resize
from swem_tpu.utils.profiling import device_seconds_from_trace

Ho, Wo = 480, 854
T, V = 33, 4  # 1 init + 2 full chunks per video
rng = np.random.default_rng(3)
cfg = ModelConfig(dtype="bfloat16", max_objs=2)
model = SWEM(cfg)
f0 = jnp.asarray(rng.random((1, 480, 864, 3)).astype(np.float32))
m0 = np.zeros((1, Ho, Wo, 3), np.float32); m0[..., 0] = 1.0
variables = jax.jit(model.init)(jax.random.PRNGKey(0), f0, jnp.asarray(m0))

frames = (rng.random((V, T, Ho, Wo, 3)) * 255).astype(np.uint8)
init_mask = np.zeros((V, Ho, Wo, 3), np.float32)
init_mask[..., 0] = 1.0
init_mask[:, 100:220, 150:330, 1] = 1.0
init_mask[:, 100:220, 150:330, 0] = 0.0
active = np.zeros((V, 2), bool); active[:, 0] = True
inj_map = np.zeros((V, Ho, Wo), np.uint8); inj_map[:, 260:400, 500:700] = 2
inj_new = np.zeros((V, 2), bool); inj_new[:, 1] = True

pre = lambda f: resize(f.astype(jnp.float32) / 255.0, (480, 864), "bicubic")
key = jax.random.PRNGKey(1)

def measure(batch):
    runner = ChunkedVideoRunner(model, (Ho, Wo), chunk=16, injectable=True,
                                preprocess=pre)
    runner.warmup(variables, (Ho, Wo), batch, 2, frame_dtype=jnp.uint8)
    def run_all():
        if batch == 1:
            for v in range(V):
                inj = {8: (inj_map[v][None], inj_new[v][None])}
                p = runner(variables, key, frames[v][:, None],
                           init_mask[v][None], jnp.asarray(active[v][None]),
                           injections=inj)
        else:
            inj = {8: (inj_map, inj_new)}
            p = runner(variables, key,
                       np.moveaxis(frames, 0, 1),  # (T,B,H,W,3)
                       init_mask, jnp.asarray(active), injections=inj)
        return p
    run_all()  # warm
    td = tempfile.mkdtemp(prefix=f"ytb{batch}_")
    try:
        with jax.profiler.trace(td):
            run_all()
        dev_s = device_seconds_from_trace(td)
    finally:
        shutil.rmtree(td, ignore_errors=True)
    total_frames = V * T
    print(f"batch={batch}: device {dev_s:.3f}s for {total_frames} frames "
          f"-> {total_frames/dev_s:.1f} frames/s device-side", flush=True)
    return total_frames / dev_s

seq = measure(1)
bat = measure(V)
print(f"YTVOS batched device-side delta: {bat/seq:.3f}x (B={V} vs sequential)")
print("PASS")
