"""Learning-level proof of the training stack (VERDICT r3 item 1).

The mechanics tests (test_train.py, test_train_loop.py) show loss decreases
and the loop runs; this shows the full production pipeline — synthetic-video
factory -> loader -> augs -> recurrent unroll -> boots-CE+IoU -> AdamW ->
schedule — actually *learns segmentation*: a tiny model trained a few
hundred iterations on generated videos lifts held-out J&F (computed by the
real Evaluator + metric stack) from near-zero to several times its
untrained value, improving monotonically-ish across a mid-training
checkpoint. This is the pre-data equivalent of the reference loop's purpose
(/root/reference/methods/basic_modules/basic_trainer.py:192-307).

Videos are moving colored rectangles on textured backgrounds: segmentation
is learnable from appearance matching (the model must associate the
memorized object features with the query frame, not memorize positions —
objects move and hues vary per video). ~5 min on a 1-core CPU host.
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from swem_tpu.config import (
    DataConfig,
    EvalConfig,
    LossConfig,
    ModelConfig,
    SolverConfig,
    SWEMConfig,
)
from swem_tpu.data.palette import davis_palette, save_seg_mask

pytestmark = pytest.mark.slow

H, W = 48, 64
ITERS = 300
MID = 100


def gen_video(rng, T=8, n_objs=2):
    """Moving colored rectangles on a textured gray background."""
    base = rng.random(3) * 0.25 + 0.3
    tex = rng.random((H, W, 1)) * 0.12
    hues = rng.permutation(np.array([
        [0.85, 0.15, 0.10], [0.10, 0.35, 0.85],
        [0.10, 0.75, 0.20], [0.90, 0.80, 0.10]]))
    objs = []
    for n in range(n_objs):
        h, w = int(rng.integers(12, 20)), int(rng.integers(12, 20))
        y, x = int(rng.integers(0, H - h)), int(rng.integers(0, W - w))
        vy, vx = int(rng.integers(-2, 3)), int(rng.integers(-2, 3))
        col = hues[n] * (0.8 + 0.4 * rng.random())
        objs.append((y, x, h, w, vy, vx, col))
    frames, labels = [], []
    for t in range(T):
        img = np.clip(base + tex + rng.normal(0, 0.02, (H, W, 3)), 0, 1)
        lab = np.zeros((H, W), np.uint8)
        for n, (y, x, h, w, vy, vx, col) in enumerate(objs):
            yy = int(np.clip(y + vy * t, 0, H - h))
            xx = int(np.clip(x + vx * t, 0, W - w))
            img[yy:yy + h, xx:xx + w] = np.clip(
                col + rng.normal(0, 0.02, (h, w, 3)), 0, 1)
            lab[yy:yy + h, xx:xx + w] = n + 1
        frames.append((img * 255).astype(np.uint8))
        labels.append(lab)
    return np.stack(frames), np.stack(labels)


def _write_video(jdir, adir, rng, pal):
    os.makedirs(jdir)
    os.makedirs(adir)
    fr, lb = gen_video(rng)
    for t in range(fr.shape[0]):
        Image.fromarray(fr[t]).save(os.path.join(jdir, f"{t:05d}.jpg"),
                                    quality=95)
        save_seg_mask(lb[t], os.path.join(adir, f"{t:05d}.png"), pal)


@pytest.fixture(scope="module")
def data_roots(tmp_path_factory):
    """Train tree (DAVIS layout, whitelist names) + held-out val tree."""
    pal = davis_palette()
    train_root = str(tmp_path_factory.mktemp("learn_train"))
    rng = np.random.default_rng(0)
    for name in ("bear", "boat", "bmx-bumps", "boxing-fisheye",
                 "breakdance-flare", "bus", "car-turn", "cat-girl"):
        _write_video(
            os.path.join(train_root, "DAVIS", "JPEGImages", "480p", name),
            os.path.join(train_root, "DAVIS", "Annotations", "480p", name),
            rng, pal)
    val_root = str(tmp_path_factory.mktemp("learn_val"))
    rng = np.random.default_rng(123)  # disjoint draw: held-out videos
    names = ["hold0", "hold1", "hold2"]
    os.makedirs(os.path.join(val_root, "ImageSets", "2017"))
    with open(os.path.join(val_root, "ImageSets", "2017", "val.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    for name in names:
        _write_video(os.path.join(val_root, "JPEGImages", "480p", name),
                     os.path.join(val_root, "Annotations", "480p", name),
                     rng, pal)
    return train_root, val_root


MODEL_CFG = ModelConfig(
    backbone="resnet18", keydim=8, valdim=16, num_bases=4,
    num_em_iters=2, topl=2, max_objs=2, mdim=16,
)


def eval_jf(variables, val_root, log_dir):
    from swem_tpu.eval.evaluator import Evaluator

    cfg = SWEMConfig(
        model=MODEL_CFG,
        eval=EvalConfig(eval_set="DAVIS17", data_root=val_root, max_objs=2,
                        davis_in_size=(H, W), chunk=4),
        log_dir=log_dir,
    )
    ev = Evaluator(cfg, variables)
    ev.evaluate_davis()
    return float(ev.get_metrics()["J&F-Mean"])


def test_train_improves_heldout_jf(data_roots, tmp_path_factory):
    from swem_tpu.train.loop import Trainer

    train_root, val_root = data_roots
    cfg = SWEMConfig(
        model=MODEL_CFG,
        data=DataConfig(data_root=train_root, vid_crop_size=(48, 48),
                        max_num_objs=2, batch_size=8, num_workers=1,
                        davis_samples_per_video=8),
        # base_lr raised for the tiny from-scratch model (the production
        # 2e-5 is tuned for ImageNet-initialized towers); milestone at 3/4
        solver=SolverConfig(stage=1, davis_iters=(ITERS * 3 // 4, ITERS),
                            base_lr=3e-4),
        # keep bootstrapped-CE at full CE for this short run
        loss=LossConfig(bs_period=(10 * ITERS, 20 * ITERS)),
        log_dir=str(tmp_path_factory.mktemp("learn_logs")), log_period=50,
        save_period=10 ** 9, vis_period=10 ** 9, exp_name="learnproof",
    )
    trainer = Trainer(cfg)

    def vars_of(state):
        return {"params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats)}

    mk = tmp_path_factory.mktemp
    jf_init = eval_jf(vars_of(trainer.state), val_root, str(mk("ev_init")))

    trainer.max_iter = MID
    jf_mid = eval_jf(vars_of(trainer.train()), val_root, str(mk("ev_mid")))

    trainer.max_iter = ITERS  # resume in place: loader restarts at step 100
    state = trainer.train()
    assert int(jax.device_get(state.step)) == ITERS
    jf_final = eval_jf(vars_of(state), val_root, str(mk("ev_final")))

    print(f"J&F init={jf_init:.4f} mid={jf_mid:.4f} final={jf_final:.4f}")
    # measured on this config: init 0.034, mid(100) ~0.25, final(300) 0.35;
    # margins leave room for platform-to-platform drift
    assert jf_init < 0.15, f"untrained model unexpectedly good: {jf_init}"
    assert jf_mid > jf_init + 0.05, (jf_init, jf_mid)
    assert jf_final > jf_init + 0.15, (jf_init, jf_final)
    assert jf_final >= 0.25, jf_final
    assert jf_final >= jf_mid - 0.05, ("not monotonic-ish", jf_mid, jf_final)
