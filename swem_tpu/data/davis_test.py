"""DAVIS evaluation video reader (re-design of
/root/reference/datasets/DAVIS_Test.py:12-63).

Numpy/host-side: yields whole videos as float arrays in [0, 1] (NHWC) plus
the frame-0 one-hot mask padded to a static object-slot budget.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from glob import glob
from typing import Iterator, List

import cv2
import numpy as np
from PIL import Image


def load_image(path: str, size=None, as_uint8: bool = False) -> np.ndarray:
    """RGB float32 [0,1], optional (h, w) bicubic resize (data_utils.py:96-116).

    ``as_uint8`` (only valid without a host resize) returns raw uint8 so the
    /255 conversion happens on-device — 4x less host->device traffic.
    """
    img = cv2.imread(path)
    assert img is not None, f"image {path} not found"
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if as_uint8:
        assert size is None, "uint8 loading skips the host-side resize"
        return img
    img = np.asarray(img, np.float32) / 255.0
    if size is not None:
        img = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_CUBIC)
    return img


def load_label(path: str, size=None) -> np.ndarray:
    """Palette PNG -> integer label map, optional nearest resize."""
    ann = Image.open(path)
    ann.load()
    if size is not None:
        ann = ann.resize((size[1], size[0]), Image.NEAREST)
    return np.array(ann, dtype=np.uint8)


def to_onehot(label: np.ndarray, n_channels: int) -> np.ndarray:
    """(H, W) int -> (H, W, C) float one-hot; ids >= C are dropped to bg."""
    clipped = np.where(label < n_channels, label, 0)
    oh = np.eye(n_channels, dtype=np.float32)[clipped]
    return oh


@dataclass
class DavisVideo:
    name: str
    frames: np.ndarray  # (T, H, W, 3) uint8 original resolution
    init_mask: np.ndarray  # (Ho, Wo, n_slots+1) one-hot float32
    n_objs: int
    frame_names: List[str]


class DavisTestSet:
    """Iterates DAVIS val videos (DAVIS_Test.py:12-63).

    ``single_obj`` collapses all ids to 1 (DAVIS-2016, DAVIS_Test.py:43-44).
    ``n_slots`` is the static object budget the masks are padded to.
    """

    def __init__(self, root: str, img_set: str = "2017/val.txt",
                 single_obj: bool = False, n_slots: int = 8):
        self.root = root
        self.single_obj = single_obj
        self.n_slots = n_slots
        with open(os.path.join(root, "ImageSets", img_set)) as f:
            self.videos = [ln.strip() for ln in f if ln.strip()]

    def __len__(self) -> int:
        return len(self.videos)

    def __getitem__(self, idx: int) -> DavisVideo:
        name = self.videos[idx]
        img_list = sorted(glob(os.path.join(self.root, "JPEGImages", "480p", name, "*.jpg")))
        mask_list = sorted(glob(os.path.join(self.root, "Annotations", "480p", name, "*.png")))
        label0 = load_label(mask_list[0])
        if self.single_obj:
            label0 = (label0 > 0).astype(np.uint8)
        n_objs = int(label0.max())
        frames = np.stack([load_image(p, as_uint8=True) for p in img_list])
        init_mask = to_onehot(label0, self.n_slots + 1)
        frame_names = [os.path.splitext(os.path.basename(p))[0] for p in img_list]
        return DavisVideo(
            name=name, frames=frames, init_mask=init_mask,
            n_objs=n_objs, frame_names=frame_names,
        )

    def peek(self, idx: int):
        """(name, out_size, n_objs, n_frames) without decoding any frames.

        Reads only the first annotation PNG (tiny, palette-indexed) and the
        frame-file listing — enough for the throughput mode to group videos
        by (out_size, slot bucket) and sort by length before batching.
        """
        name = self.videos[idx]
        mask0 = sorted(glob(os.path.join(self.root, "Annotations", "480p", name, "*.png")))[0]
        label0 = load_label(mask0)
        if self.single_obj:
            label0 = (label0 > 0).astype(np.uint8)
        n_objs = int(label0.max())
        n_frames = len(glob(os.path.join(self.root, "JPEGImages", "480p", name, "*.jpg")))
        return name, label0.shape, n_objs, n_frames

    def __iter__(self) -> Iterator[DavisVideo]:
        for i in range(len(self)):
            yield self[i]
