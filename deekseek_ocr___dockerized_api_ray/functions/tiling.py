"""Pure tiling / image-token math replicated from the reference.

These are the deterministic geometry functions behind the reference's
image preprocessing -- no pixels touched here, so they run anywhere
(the pixel-level resize/crop lives in stages/multimodal.py behind the
actor-pool plumbing, stubbed when PIL is absent).

Reference citations:
  - find_closest_aspect_ratio ... docker/overrides/process/image_process.py:11-25
  - count_tiles ................. image_process.py:28-42
  - dynamic_preprocess geometry . image_process.py:45-83
  - tile/no-tile decision ....... image_process.py:355-366 (<=640x640 -> no tiles)
  - image token count ........... docker/overrides/deepseek_ocr.py:81-126
  - mode presets ................ docker/overrides/config.py:5-16
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Tuple

# Gundam-mode defaults (docker/overrides/config.py:12-16).
BASE_SIZE = 1024
IMAGE_SIZE = 640
CROP_MODE = True
MIN_CROPS = 2
MAX_CROPS = 6


@dataclass(frozen=True)
class TilingPreset:
    """A reference mode row (docker/overrides/config.py:5-10)."""

    name: str
    base_size: int
    image_size: int
    crop_mode: bool


PRESETS = {
    "tiny": TilingPreset("tiny", 512, 512, False),
    "small": TilingPreset("small", 640, 640, False),
    "base": TilingPreset("base", 1024, 1024, False),
    "large": TilingPreset("large", 1280, 1280, False),
    "gundam": TilingPreset("gundam", 1024, 640, True),
}


def candidate_grids(min_num: int = MIN_CROPS, max_num: int = MAX_CROPS) -> List[Tuple[int, int]]:
    """Candidate (cols, rows) grids with min_num <= cols*rows <= max_num,
    sorted by area (image_process.py:31-36)."""
    ratios = set(
        (i, j)
        for n in range(min_num, max_num + 1)
        for i in range(1, n + 1)
        for j in range(1, n + 1)
        if min_num <= i * j <= max_num
    )
    return sorted(ratios, key=lambda x: x[0] * x[1])


def find_closest_aspect_ratio(
    aspect_ratio: float,
    target_ratios: List[Tuple[int, int]],
    width: int,
    height: int,
    image_size: int,
) -> Tuple[int, int]:
    """Pick the candidate grid whose aspect is closest; ties broken by the
    area > 0.5*image_size^2*cells test (image_process.py:11-25)."""
    best_ratio_diff = float("inf")
    best_ratio = (1, 1)
    area = width * height
    for ratio in target_ratios:
        target_aspect_ratio = ratio[0] / ratio[1]
        ratio_diff = abs(aspect_ratio - target_aspect_ratio)
        if ratio_diff < best_ratio_diff:
            best_ratio_diff = ratio_diff
            best_ratio = ratio
        elif ratio_diff == best_ratio_diff:
            if area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
                best_ratio = ratio
    return best_ratio


def count_tiles(
    orig_width: int,
    orig_height: int,
    min_num: int = MIN_CROPS,
    max_num: int = MAX_CROPS,
    image_size: int = IMAGE_SIZE,
) -> Tuple[int, int]:
    """(tiles_wide, tiles_high) for an image (image_process.py:28-42)."""
    aspect_ratio = orig_width / orig_height
    return find_closest_aspect_ratio(
        aspect_ratio, candidate_grids(min_num, max_num), orig_width, orig_height, image_size
    )


def needs_tiling(width: int, height: int, image_size: int = IMAGE_SIZE, crop_mode: bool = CROP_MODE) -> bool:
    """The tokenizer's tile/no-tile decision: images with both dims
    <= 640 get no local tiles (image_process.py:355-366)."""
    if not crop_mode:
        return False
    return not (width <= 640 and height <= 640)


def tile_grid(width: int, height: int, crop_mode: bool = CROP_MODE) -> Tuple[int, int]:
    """Effective (tiles_wide, tiles_high) including the <=640x640 shortcut."""
    if not needs_tiling(width, height, crop_mode=crop_mode):
        return (1, 1)
    return count_tiles(width, height)


def tile_boxes(width: int, height: int, image_size: int = IMAGE_SIZE) -> Tuple[Tuple[int, int], List[Tuple[int, int, int, int]]]:
    """The resize target and row-major crop boxes of dynamic_preprocess
    (image_process.py:60-80), without touching pixels.

    Returns ((target_width, target_height), [(x1, y1, x2, y2), ...]).
    """
    nw, nh = count_tiles(width, height, image_size=image_size)
    target_width = image_size * nw
    target_height = image_size * nh
    blocks = nw * nh
    cols = target_width // image_size
    boxes = [
        (
            (i % cols) * image_size,
            (i // cols) * image_size,
            ((i % cols) + 1) * image_size,
            ((i // cols) + 1) * image_size,
        )
        for i in range(blocks)
    ]
    return (target_width, target_height), boxes


def image_token_count(
    width: int,
    height: int,
    base_size: int = BASE_SIZE,
    image_size: int = IMAGE_SIZE,
    crop_mode: bool = CROP_MODE,
) -> int:
    """Number of image tokens a page consumes (deepseek_ocr.py:81-126).

    global = h*(w+1) with h=w=ceil((base_size/16)/4); local =
    (nh*h2)*(nw*w2+1) with h2=w2=ceil((image_size/16)/4) when tiled;
    +1 view separator. Gundam defaults: 16*17 + tiles + 1.
    """
    patch_size = 16
    downsample_ratio = 4
    if crop_mode:
        if width <= 640 and height <= 640:
            nw, nh = 1, 1
        else:
            nw, nh = count_tiles(width, height, image_size=image_size)
    else:
        nw = nh = 1
    h = w = math.ceil((base_size // patch_size) / downsample_ratio)
    h2 = w2 = math.ceil((image_size // patch_size) / downsample_ratio)
    global_views_tokens = h * (w + 1)
    if nw > 1 or nh > 1:
        local_views_tokens = (nh * h2) * (nw * w2 + 1)
    else:
        local_views_tokens = 0
    return global_views_tokens + local_views_tokens + 1
