"""Dataset-factory stage wiring tests (datasets/__init__.py:9-71 semantics)."""

import os

import numpy as np
import pytest
from PIL import Image

from swem_tpu.config import DataConfig, SolverConfig, SWEMConfig
from swem_tpu.data.factory import ConcatDataset, build_dataset_factory
from swem_tpu.data.palette import davis_palette, save_seg_mask


def build_roots(base):
    pal = davis_palette()
    rng = np.random.default_rng(0)
    # DAVIS train videos (names must be in the davis_subset whitelist)
    for name in ("bear", "boat"):
        jdir = os.path.join(base, "DAVIS", "JPEGImages", "480p", name)
        adir = os.path.join(base, "DAVIS", "Annotations", "480p", name)
        os.makedirs(jdir)
        os.makedirs(adir)
        for t in range(4):
            Image.fromarray((rng.random((40, 60, 3)) * 255).astype(np.uint8)).save(
                os.path.join(jdir, f"{t:05d}.jpg"))
            lab = np.zeros((40, 60), np.uint8)
            lab[10:30, 10:40] = 1
            save_seg_mask(lab, os.path.join(adir, f"{t:05d}.png"), pal)
    # YTVOS train videos (names from yv_subset)
    import swem_tpu.data.factory as F

    with open(os.path.join(F.IMAGESETS_DIR, "yv_subset.txt")) as f:
        yv_names = [ln.strip() for ln in f][:2]
    for name in yv_names:
        jdir = os.path.join(base, "YTVOS19", "train_480p", "JPEGImages", name)
        adir = os.path.join(base, "YTVOS19", "train_480p", "Annotations", name)
        os.makedirs(jdir)
        os.makedirs(adir)
        for t in range(4):
            Image.fromarray((rng.random((40, 60, 3)) * 255).astype(np.uint8)).save(
                os.path.join(jdir, f"{t:05d}.jpg"))
            lab = np.zeros((40, 60), np.uint8)
            lab[5:20, 20:50] = 1
            save_seg_mask(lab, os.path.join(adir, f"{t:05d}.png"), pal)
    return yv_names


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("data"))
    build_roots(base)
    return base


def make_cfg(base, stage):
    return SWEMConfig(
        data=DataConfig(data_root=base, vid_crop_size=(32, 32), max_num_objs=2),
        solver=SolverConfig(stage=stage, davis_iters=(50, 100),
                            maintrain_iters=(50, 100)),
    )


class TestFactory:
    def test_stage1_davis(self, roots):
        ds = build_dataset_factory(make_cfg(roots, 1))()
        assert len(ds) == 2 * 5  # 2 videos x samples_per_video
        out = ds.sample(np.random.default_rng(0), 0, 10)
        assert out["frames"].shape == (3, 32, 32, 3)

    def test_stage2_ytvos(self, roots):
        ds = build_dataset_factory(make_cfg(roots, 2))()
        assert len(ds) == 2  # 2 videos x 1 sample each
        out = ds.sample(np.random.default_rng(0), 1, 10)
        assert out["label"].shape == (3, 32, 32)

    def test_stage3_concat(self, roots):
        """Stage 3 = DAVIS x DATA_FREQ + YTVOS (datasets/__init__.py:29-38)."""
        ds = build_dataset_factory(make_cfg(roots, 3))()
        assert isinstance(ds, ConcatDataset)
        assert ds.total == 2 * 5 + 2
        # indices route into both sub-datasets
        a = ds.sample(np.random.default_rng(0), 0, 10)
        b = ds.sample(np.random.default_rng(0), ds.total - 1, 10)
        assert a["frames"].shape == b["frames"].shape

    def test_factory_is_picklable(self, roots):
        import pickle

        f = build_dataset_factory(make_cfg(roots, 3))
        f2 = pickle.loads(pickle.dumps(f))
        assert len(f2()) == 12
