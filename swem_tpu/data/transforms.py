"""Host-side image/mask augmentations (numpy + PIL + cv2, torch-free).

Re-design of the torchvision pipelines in
/root/reference/datasets/video_dataset.py:139-192 and
static_dataset.py:196-240. The reference keeps image and mask transforms in
sync by re-seeding global RNGs before each call (data_utils.py:11-13); here
every transform samples an explicit parameter object once and applies it to
image and mask with their respective interpolations — same distribution,
deterministic, no global state.

Interpolation policy: bicubic for images, nearest for masks (the reference
uses bicubic for static-dataset mask affines, a quirk we do not reproduce).
``im_mean`` fill matches data_utils.py:8.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance

IM_MEAN = (124, 116, 104)  # data_utils.py:8


# --------------------------------------------------------------------- #
# Color jitter (torchvision semantics: random factor per enabled op,
# random op order)
# --------------------------------------------------------------------- #
@dataclass
class ColorJitterParams:
    ops: List[Tuple[str, float]]  # ordered (name, factor)


def sample_color_jitter(
    rng: np.random.Generator,
    brightness: float = 0.0,
    contrast: float = 0.0,
    saturation: float = 0.0,
    hue: float = 0.0,
) -> ColorJitterParams:
    ops = []
    if brightness > 0:
        ops.append(("brightness", rng.uniform(max(0.0, 1 - brightness), 1 + brightness)))
    if contrast > 0:
        ops.append(("contrast", rng.uniform(max(0.0, 1 - contrast), 1 + contrast)))
    if saturation > 0:
        ops.append(("saturation", rng.uniform(max(0.0, 1 - saturation), 1 + saturation)))
    if hue > 0:
        ops.append(("hue", rng.uniform(-hue, hue)))
    order = rng.permutation(len(ops))
    return ColorJitterParams([ops[i] for i in order])


def apply_color_jitter(img: Image.Image, params: ColorJitterParams) -> Image.Image:
    for name, factor in params.ops:
        if name == "brightness":
            img = ImageEnhance.Brightness(img).enhance(factor)
        elif name == "contrast":
            img = ImageEnhance.Contrast(img).enhance(factor)
        elif name == "saturation":
            img = ImageEnhance.Color(img).enhance(factor)
        elif name == "hue":
            hsv = np.array(img.convert("HSV"), np.uint8)
            hsv[..., 0] = (hsv[..., 0].astype(np.int16) + int(factor * 255)) % 256
            img = Image.fromarray(hsv, "HSV").convert("RGB")
    return img


# --------------------------------------------------------------------- #
# Random affine (torchvision RandomAffine parametrization)
# --------------------------------------------------------------------- #
@dataclass
class AffineParams:
    angle: float
    translate: Tuple[float, float]
    scale: float
    shear_x: float


def sample_affine(
    rng: np.random.Generator,
    degrees: float = 0.0,
    scale_range: Optional[Tuple[float, float]] = None,
    shear: float = 0.0,
) -> AffineParams:
    angle = rng.uniform(-degrees, degrees) if degrees else 0.0
    scale = rng.uniform(*scale_range) if scale_range else 1.0
    shear_x = rng.uniform(-shear, shear) if shear else 0.0
    return AffineParams(angle, (0.0, 0.0), scale, shear_x)


def _inverse_affine_matrix(params: AffineParams, center: Tuple[float, float]):
    """torchvision's inverse affine coefficients for PIL.Image.transform."""
    rot = math.radians(params.angle)
    sx = math.radians(params.shear_x)
    cx, cy = center
    tx, ty = params.translate
    a = math.cos(rot)
    b = -math.cos(rot) * math.tan(sx) - math.sin(rot)
    c = math.sin(rot)
    d = -math.sin(rot) * math.tan(sx) + math.cos(rot)
    m = [d, -b, 0.0, -c, a, 0.0]
    m = [x / params.scale for x in m]
    m[2] += m[0] * (-cx - tx) + m[1] * (-cy - ty)
    m[5] += m[3] * (-cx - tx) + m[4] * (-cy - ty)
    m[2] += cx
    m[5] += cy
    return m


def apply_affine(img: Image.Image, params: AffineParams, interp, fill) -> Image.Image:
    w, h = img.size
    matrix = _inverse_affine_matrix(params, (w * 0.5, h * 0.5))
    fillcolor = tuple(fill) if isinstance(fill, (tuple, list)) and img.mode == "RGB" else (
        fill if not isinstance(fill, (tuple, list)) else fill[0]
    )
    return img.transform((w, h), Image.AFFINE, matrix, resample=interp, fillcolor=fillcolor)


# --------------------------------------------------------------------- #
# Random resized crop (torchvision sampling incl. fallback)
# --------------------------------------------------------------------- #
@dataclass
class ResizedCropParams:
    top: int
    left: int
    height: int
    width: int


def sample_resized_crop(
    rng: np.random.Generator,
    img_size: Tuple[int, int],  # (w, h) PIL order
    scale: Tuple[float, float],
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
) -> ResizedCropParams:
    w, h = img_size
    area = h * w
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            top = int(rng.integers(0, h - ch + 1))
            left = int(rng.integers(0, w - cw + 1))
            return ResizedCropParams(top, left, ch, cw)
    # fallback: center crop at clipped aspect ratio
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw = w
        ch = int(round(cw / ratio[0]))
    elif in_ratio > ratio[1]:
        ch = h
        cw = int(round(ch * ratio[1]))
    else:
        cw, ch = w, h
    top = (h - ch) // 2
    left = (w - cw) // 2
    return ResizedCropParams(top, left, ch, cw)


def apply_resized_crop(img: Image.Image, params: ResizedCropParams,
                       out_size: Tuple[int, int], interp) -> Image.Image:
    box = (params.left, params.top, params.left + params.width, params.top + params.height)
    return img.resize((out_size[1], out_size[0]), interp, box=box)


# --------------------------------------------------------------------- #
# Simple crops / resizes
# --------------------------------------------------------------------- #
@dataclass
class CropParams:
    top: int
    left: int


def resize_short_side(img: Image.Image, size: int, interp) -> Image.Image:
    w, h = img.size
    if h < w:
        nh, nw = size, size * w // h
    else:
        nw, nh = size, size * h // w
    return img.resize((nw, nh), interp)


def sample_crop(rng: np.random.Generator, img_size: Tuple[int, int],
                out_size: Tuple[int, int]) -> CropParams:
    w, h = img_size
    oh, ow = out_size
    top = int(rng.integers(0, max(h - oh, 0) + 1))
    left = int(rng.integers(0, max(w - ow, 0) + 1))
    return CropParams(top, left)


def apply_crop_padded(img: Image.Image, params: CropParams,
                      out_size: Tuple[int, int], fill) -> Image.Image:
    """Crop to out_size, padding with fill if the image is smaller
    (torchvision RandomCrop(pad_if_needed=True))."""
    oh, ow = out_size
    w, h = img.size
    if w < ow or h < oh:
        fillcolor = tuple(fill) if img.mode == "RGB" else (
            fill if not isinstance(fill, (tuple, list)) else fill[0]
        )
        padded = Image.new(img.mode, (max(w, ow), max(h, oh)), fillcolor)
        padded.paste(img, (0, 0))
        img = padded
        w, h = img.size
    left = min(params.left, w - ow)
    top = min(params.top, h - oh)
    return img.crop((left, top, left + ow, top + oh))


def hflip(img: Image.Image) -> Image.Image:
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def to_grayscale(img: Image.Image) -> Image.Image:
    return img.convert("L").convert("RGB")
