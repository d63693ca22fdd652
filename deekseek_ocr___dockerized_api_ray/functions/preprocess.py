"""A4 tensor-preprocessing pure math (no torch, no PIL pixels).

Replicates, as arithmetic on dimensions, the preprocessing the reference
runs before model forward (docker/overrides/process/image_process.py):

  - global-view pad geometry: ``ImageOps.pad(image, (base, base),
    color=(127,127,127))`` (image_process.py:380-382; fill =
    ``tuple(int(0.5*255))`` from the normalize mean). PIL's
    ``contain``/``pad`` use Python ``round`` (banker's); so do we.
  - normalize(0.5, 0.5): uint8 HWC -> float32 CHW in [-1, 1]
    (image_process.py:91-101, T.ToTensor + T.Normalize).
  - image-token sequence layout: the BOS/text/image-run/EOS structure of
    ``tokenize_with_images`` (image_process.py:326-496) minus the text
    tokenizer itself -- every image token is the same id, so the layout
    is fully determined by per-segment text token counts and image dims.

The pixel RESAMPLING (bicubic resize) is the PIL-stubbed boundary in
stages/multimodal.py; everything here is exact and environment-free.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

from .tiling import BASE_SIZE, IMAGE_SIZE, count_tiles

#: Normalize constants (image_process.py:91-92): mean = std = 0.5 per channel.
NORM_MEAN = 0.5
NORM_STD = 0.5
#: Global-view pad fill: tuple(int(x*255) for x in mean) == (127, 127, 127).
PAD_FILL = (int(NORM_MEAN * 255),) * 3


@dataclass(frozen=True)
class PadGeometry:
    """Where the aspect-preserved image lands inside the square canvas."""

    resized_w: int
    resized_h: int
    paste_x: int
    paste_y: int
    target: int
    fill: Tuple[int, int, int] = PAD_FILL


def contain_size(width: int, height: int, target_w: int, target_h: int) -> Tuple[int, int]:
    """PIL ``ImageOps.contain`` size math (aspect-preserving fit, Python
    ``round`` = banker's, exactly as PIL does)."""
    im_ratio = width / height
    dest_ratio = target_w / target_h
    if im_ratio != dest_ratio:
        if im_ratio > dest_ratio:
            new_height = round(height / width * target_w)
            if new_height != target_h:
                return target_w, new_height
        else:
            new_width = round(width / height * target_h)
            if new_width != target_w:
                return new_width, target_h
    return target_w, target_h


def pad_geometry(width: int, height: int, target: int = BASE_SIZE,
                 centering: Tuple[float, float] = (0.5, 0.5)) -> PadGeometry:
    """``ImageOps.pad(image, (target, target), color=PAD_FILL)`` geometry:
    contain-resize then centered paste (PIL pastes at x OR y, never both,
    because contain pins one dimension to the target)."""
    rw, rh = contain_size(width, height, target, target)
    px = py = 0
    if (rw, rh) != (target, target):
        if rw != target:
            px = round((target - rw) * max(0, min(centering[0], 1)))
        else:
            py = round((target - rh) * max(0, min(centering[1], 1)))
    return PadGeometry(rw, rh, px, py, target)


def normalize_chw(arr_hwc: np.ndarray, mean: float = NORM_MEAN,
                  std: float = NORM_STD) -> np.ndarray:
    """uint8 HWC -> float32 CHW, (x/255 - mean) / std -- the exact
    ToTensor+Normalize composition (image_process.py:96-101)."""
    f = arr_hwc.astype(np.float32) / 255.0
    f = (f - np.float32(mean)) / np.float32(std)
    return np.ascontiguousarray(np.transpose(f, (2, 0, 1)))


def pad_global_view(arr_hwc: np.ndarray, target: int = BASE_SIZE) -> np.ndarray:
    """Paste an ALREADY-RESIZED (resized_h, resized_w, 3) uint8 array onto
    the mean-gray square canvas at the pad_geometry offsets. (The resize
    itself is the PIL boundary; this is the deterministic remainder.)"""
    h, w = arr_hwc.shape[:2]
    g = pad_geometry(w, h, target)
    if (w, h) != (g.resized_w, g.resized_h):
        raise ValueError(
            f"array is {(w, h)} but pad geometry expects the contain-resized "
            f"{(g.resized_w, g.resized_h)}; resize first (PIL boundary)"
        )
    canvas = np.full((target, target, 3), PAD_FILL[0], dtype=np.uint8)
    canvas[g.paste_y : g.paste_y + h, g.paste_x : g.paste_x + w] = arr_hwc
    return canvas


def num_queries(size: int, patch_size: int = 16, downsample_ratio: int = 4) -> int:
    """ceil((size // patch) / downsample) (image_process.py:421-423)."""
    return math.ceil((size // patch_size) / downsample_ratio)


def image_token_run(width: int, height: int, base_size: int = BASE_SIZE,
                    image_size: int = IMAGE_SIZE, crop_mode: bool = True) -> int:
    """Length of the per-image token run ``tokenized_image``
    (image_process.py:426-431): ``([t]*nqb + [t]) * nqb + [t]`` for the
    global view (+1 per row = the row separator, +1 view separator), plus
    ``([t]*(nq*nw) + [t]) * (nq*nh)`` for the tiled local views."""
    nqb = num_queries(base_size)
    nq = num_queries(image_size)
    if crop_mode and not (width <= 640 and height <= 640):
        nw, nh = count_tiles(width, height, image_size=image_size)
    else:
        nw, nh = 1, 1
    n = (nqb + 1) * nqb + 1
    if nw > 1 or nh > 1:
        n += (nq * nw + 1) * (nq * nh)
    return n


@dataclass(frozen=True)
class TokenLayout:
    """The structural output of tokenize_with_images: alternating
    text/image segments plus BOS/EOS bookkeeping."""

    seq_mask: List[bool]          # True where an image token sits
    num_image_tokens: List[int]   # per image, == image_token_run
    total_len: int


def build_token_layout(text_token_counts: Sequence[int],
                       image_dims: Sequence[Tuple[int, int]],
                       bos: bool = True, eos: bool = True,
                       crop_mode: bool = True,
                       inference_mode: bool = True,
                       base_size: int = BASE_SIZE,
                       image_size: int = IMAGE_SIZE) -> TokenLayout:
    """The BOS/text/image/EOS interleave of tokenize_with_images
    (image_process.py:337-485) with text segments abstracted to their
    token counts (the prompt has ``len(image_dims)`` <image> slots, so
    ``text_token_counts`` has one more entry than ``image_dims``).

    ``inference_mode=True`` strips the trailing EOS token, as the
    reference always does (image_process.py:473-480).
    """
    if len(text_token_counts) != len(image_dims) + 1:
        raise ValueError(
            f"prompt with {len(image_dims)} images needs {len(image_dims) + 1} "
            f"text segments, got {len(text_token_counts)}"
        )
    mask: List[bool] = []
    nits: List[int] = []
    for t_count, (w, h) in zip(text_token_counts, image_dims):
        mask += [False] * t_count
        nit = image_token_run(w, h, base_size, image_size, crop_mode)
        mask += [True] * nit
        nits.append(nit)
    mask += [False] * text_token_counts[-1]
    if bos:
        mask = [False] + mask
    if eos:
        mask = mask + [False]
    if inference_mode:
        if not eos:
            raise ValueError("inference_mode strips the EOS; eos must be True")
        mask = mask[:-1]
    return TokenLayout(mask, nits, len(mask))
