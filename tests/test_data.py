"""Data pipeline tests: TPS vs torch grid_sample oracle, augmentation
shape/determinism, dataset sampling over synthetic directory trees, loader
determinism/resume."""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
from PIL import Image

from swem_tpu.data import transforms as T
from swem_tpu.data.palette import davis_palette, save_seg_mask
from swem_tpu.data.static_dataset import StaticTrainDataset, synthesis_frames
from swem_tpu.data.tps import JointRandomTPS, tps_sample_grid, warp_image
from swem_tpu.data.video_dataset import FrameSkipper, VideoTrainDataset, select_frames
from swem_tpu.data.loader import TrainLoader


class TestTPS:
    def test_identity_without_noise(self, rng):
        grid = tps_sample_grid(rng, (32, 48), margin_rate=0.0)
        # zero jitter -> identity mapping
        gx = np.linspace(-1, 1, 48)
        gy = np.linspace(-1, 1, 32)
        np.testing.assert_allclose(grid[0, :, 0], gx, atol=1e-5)
        np.testing.assert_allclose(grid[:, 0, 1], gy, atol=1e-5)

    def test_warp_matches_torch_grid_sample(self, rng):
        img = rng.standard_normal((40, 56, 3)).astype(np.float32)
        grid = tps_sample_grid(rng, (40, 56), margin_rate=0.3)
        ours = warp_image(img, grid, "bilinear")
        ref = TF.grid_sample(
            torch.from_numpy(img).permute(2, 0, 1)[None],
            torch.from_numpy(grid)[None],
            mode="bilinear", align_corners=False,
        )[0].permute(1, 2, 0).numpy()
        # interiors must match; borders may differ (cv2 constant-border vs
        # grid_sample zero padding handle partial taps slightly differently)
        diff = np.abs(ours - ref)[2:-2, 2:-2]
        assert diff.max() < 1e-4

    def test_mask_warp_preserves_labels(self, rng):
        mask = np.zeros((40, 40), np.uint8)
        mask[10:20, 10:20] = 3
        mask[25:35, 25:35] = 7
        grid = tps_sample_grid(rng, (40, 40), margin_rate=0.25)
        warped = warp_image(mask, grid, "nearest")
        assert set(np.unique(warped)) <= {0, 3, 7}

    def test_joint_apply(self, rng):
        tps = JointRandomTPS(margin_rate=0.25, p=1.0)
        img = rng.random((32, 32, 3)).astype(np.float32)
        mask = (rng.random((32, 32)) > 0.5).astype(np.uint8)
        wimg, wmask = tps(rng, img, mask)
        assert wimg.shape == img.shape and wmask.shape == mask.shape


class TestTransforms:
    def test_affine_identity(self):
        img = Image.fromarray(np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3))
        p = T.AffineParams(0.0, (0.0, 0.0), 1.0, 0.0)
        out = T.apply_affine(img, p, Image.NEAREST, 0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_resized_crop_shapes(self, rng):
        img = Image.fromarray((rng.random((100, 150, 3)) * 255).astype(np.uint8))
        p = T.sample_resized_crop(rng, img.size, scale=(0.36, 1.0))
        out = T.apply_resized_crop(img, p, (64, 64), Image.BICUBIC)
        assert out.size == (64, 64)

    def test_crop_padded_small_image(self, rng):
        img = Image.fromarray((rng.random((40, 30, 3)) * 255).astype(np.uint8))
        p = T.sample_crop(rng, img.size, (64, 64))
        out = T.apply_crop_padded(img, p, (64, 64), T.IM_MEAN)
        assert out.size == (64, 64)

    def test_color_jitter_runs(self, rng):
        img = Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8))
        p = T.sample_color_jitter(rng, 0.1, 0.05, 0.05, 0.05)
        out = T.apply_color_jitter(img, p)
        assert out.size == img.size and out.mode == "RGB"

    def test_color_jitter_bitexact_vs_pil_enhance(self, rng):
        """The cv2/numpy jitter must reproduce the PIL ImageEnhance chain
        (what torchvision ColorJitter runs on PIL inputs —
        video_dataset.py:148-152) bit-for-bit, including Blend.c's
        truncation and convert("L")'s fixed-point grayscale."""
        from PIL import ImageEnhance

        enh = {"brightness": ImageEnhance.Brightness,
               "contrast": ImageEnhance.Contrast,
               "saturation": ImageEnhance.Color}
        for _ in range(10):
            p = T.sample_color_jitter(rng, 0.3, 0.3, 0.3, 0.0)
            img = Image.fromarray(
                rng.integers(0, 256, (41, 67, 3), dtype=np.uint8), "RGB")
            ref = img
            for name, factor in p.ops:
                ref = enh[name](ref).enhance(factor)
            out = T.apply_color_jitter(img, p)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_affine_matches_pil_geometry(self, rng):
        """cv2.warpAffine with the rebased inverse matrix must land on
        PIL.transform(AFFINE)'s geometry: nearest-warped masks may differ
        only on a sliver of rounding-tie pixels, never shift."""
        for _ in range(5):
            p = T.sample_affine(rng, degrees=15.0, shear=10.0)
            lab = rng.integers(0, 4, (61, 83)).astype(np.uint8)
            mask = Image.fromarray(lab, "P")
            m = T._inverse_affine_matrix(p, (83 * 0.5, 61 * 0.5))
            ref = mask.transform(mask.size, Image.AFFINE, m,
                                 resample=Image.NEAREST, fillcolor=0)
            out = T.apply_affine(mask, p, Image.NEAREST, 0)
            mismatch = (np.asarray(ref) != np.asarray(out)).mean()
            assert mismatch < 0.005, mismatch


class TestFrameSelection:
    def test_skipper_schedule(self):
        sk = FrameSkipper(max_skip=25, max_iter=100000)
        assert sk(0) == 0
        assert sk(10000) == 25
        assert sk(50000) == 25
        assert sk(90000) == sk.final_skip == 10
        assert sk(95000) == 10

    def test_select_frames_respects_skip(self, rng):
        for _ in range(50):
            sel = sorted(select_frames(rng, 60, 3, cur_skip=5))
            gaps = [sel[i + 1] - sel[i] for i in range(2)]
            assert all(g <= 6 for g in gaps), sel
        sel = select_frames(rng, 2, 3, cur_skip=5)  # short video -> replace
        assert len(sel) == 3


def build_fake_video_root(root, n_videos=2, n_frames=6, size=(80, 120)):
    rng = np.random.default_rng(0)
    pal = davis_palette()
    names = []
    for i in range(n_videos):
        name = f"video{i}"
        names.append(name)
        jdir = os.path.join(root, "JPEGImages", "480p", name)
        adir = os.path.join(root, "Annotations", "480p", name)
        os.makedirs(jdir)
        os.makedirs(adir)
        for t in range(n_frames):
            img = (rng.random(size + (3,)) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(jdir, f"{t:05d}.jpg"))
            lab = np.zeros(size, np.uint8)
            lab[20:40, 20 + t : 50 + t] = 1
            lab[50:70, 60:100] = 2
            save_seg_mask(lab, os.path.join(adir, f"{t:05d}.png"), pal)
    return names


class TestVideoDataset:
    def test_sample_shapes(self, tmp_path, rng):
        build_fake_video_root(str(tmp_path))
        ds = VideoTrainDataset("DAVIS17", str(tmp_path), num_frames=3,
                               max_objs=2, crop_size=(64, 64), max_iter=1000)
        out = ds.sample(rng, 0, cur_iter=500)
        # compact contract: uint8 frames + uint8 slot labels; the one-hot
        # and [0,1] normalization are derived in-graph (trainer._model_inputs)
        assert out["frames"].shape == (3, 64, 64, 3)
        assert out["frames"].dtype == np.uint8
        assert out["label"].shape == (3, 64, 64)
        assert out["label"].dtype == np.uint8
        assert out["label"].max() <= 2
        assert out["valid_obj"].shape == (3,)


class TestStaticDataset:
    def build_root(self, root, n=6, size=(90, 110)):
        rng = np.random.default_rng(1)
        pal = davis_palette()
        for dset in ["FSS"]:
            jdir = os.path.join(root, "JPEGImages", dset)
            adir = os.path.join(root, "Annotations", dset)
            os.makedirs(jdir)
            os.makedirs(adir)
            for i in range(n):
                img = (rng.random(size + (3,)) * 255).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(jdir, f"im{i}.jpg"))
                lab = np.zeros(size, np.uint8)
                lab[20:60, 30:80] = 1
                save_seg_mask(lab, os.path.join(adir, f"im{i}.png"), pal)

    def test_synthesis_and_sample(self, tmp_path, rng):
        self.build_root(str(tmp_path))
        ds = StaticTrainDataset(str(tmp_path), datasets=("FSS",), ratios=(1,),
                                num_frames=3, max_objs=2, crop_size=(64, 64))
        out = ds.sample(rng, 0)
        assert out["frames"].shape == (3, 64, 64, 3)
        assert out["frames"].dtype == np.uint8
        assert out["label"].shape == (3, 64, 64)
        assert out["valid_obj"][0] == 1.0

    def test_synthesis_frames_multiobject(self, rng):
        imgs = [Image.fromarray((rng.random((60, 60, 3)) * 255).astype(np.uint8))
                for _ in range(2)]
        msks = []
        for _ in range(2):
            m = np.zeros((60, 60), np.uint8)
            m[20:40, 20:40] = 1
            msks.append(Image.fromarray(m, "P"))
        sims, smks = synthesis_frames(rng, imgs, msks, nframe=3)
        assert len(sims) == 3
        ids = set()
        for m in smks:
            ids |= set(np.unique(np.asarray(m)))
        assert len(ids - {0}) >= 1  # objects placed with nonzero ids


class TestLoader:
    def test_deterministic_and_resumable(self, tmp_path):
        build_fake_video_root(str(tmp_path))

        def factory():
            return VideoTrainDataset("DAVIS17", str(tmp_path), num_frames=3,
                                     max_objs=2, crop_size=(32, 32), max_iter=100)

        def collect(start, n, seed=7):
            loader = TrainLoader(factory, batch=2, seed=seed, num_workers=0,
                                 start_iter=start)
            it = iter(loader)
            out = [next(it) for _ in range(n)]
            loader.close()
            return out

        a = collect(0, 3)
        b = collect(0, 3)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["frames"], y["frames"])
        # resume from iter 2 reproduces the tail of the schedule
        c = collect(2, 1)
        np.testing.assert_array_equal(a[2]["frames"], c[0]["frames"])

    def test_sharding_disjoint(self, tmp_path):
        build_fake_video_root(str(tmp_path), n_videos=4)

        def factory():
            return VideoTrainDataset("DAVIS17", str(tmp_path), num_frames=3,
                                     max_objs=2, crop_size=(32, 32), max_iter=100)

        l0 = TrainLoader(factory, batch=2, seed=3, num_workers=0, shard_id=0, num_shards=2)
        l1 = TrainLoader(factory, batch=2, seed=3, num_workers=0, shard_id=1, num_shards=2)
        i0 = l0._batch_indices()
        i1 = l1._batch_indices()
        assert len(i0) == len(i1) == 2
        assert not set(i0) & set(i1)

    def test_close_joins_producer_thread(self, tmp_path):
        """close() must stop the producer thread even when the caller just
        stops pulling batches (without it, a daemon thread keeps building
        one more batch — found stealing host CPU in scripts/loader_bench.py)."""
        build_fake_video_root(str(tmp_path))

        def factory():
            return VideoTrainDataset("DAVIS17", str(tmp_path), num_frames=3,
                                     max_objs=2, crop_size=(32, 32), max_iter=100)

        loader = TrainLoader(factory, batch=2, seed=5, num_workers=0)
        it = iter(loader)
        next(it)  # producer thread is now alive and prefetching
        t = loader._thread
        assert t is not None and t.is_alive()
        loader.close()  # no generator close: close() alone must stop it
        assert not t.is_alive()
        assert loader._thread is None
