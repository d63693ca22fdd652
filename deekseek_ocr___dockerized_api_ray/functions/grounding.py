"""Grounding-span parsing: labels + bounding boxes from model output.

The reference parses model-emitted coordinate lists with ``eval``
(Lib/postprocessor.py:104, run_dpsk_ocr_pdf.py:144). We parse with
``ast.literal_eval`` plus shape validation -- never ``eval`` on model
output -- while preserving the reference's failure->placeholder behavior
(a parse error propagates as an exception the caller maps to the same
placeholder string the reference produces).
"""

from __future__ import annotations

import ast
from typing import List, Optional, Sequence, Tuple


def parse_det_coords(det_content: str) -> List[List[float]]:
    """Parse a det coordinate payload like ``[[x1, y1, x2, y2], ...]``.

    Replicates the accepting behavior of ``eval(det_content)`` at
    Lib/postprocessor.py:104 for well-formed literals, raising
    ``ValueError`` for anything that is not a list of 4-number
    sequences (the reference's ``eval`` would raise on malformed input
    too, caught at :132-134).
    """
    parsed = ast.literal_eval(det_content)
    if not isinstance(parsed, (list, tuple)):
        raise ValueError(f"det content is not a list: {det_content!r}")
    boxes: List[List[float]] = []
    for points in parsed:
        if not isinstance(points, (list, tuple)) or len(points) != 4:
            raise ValueError(f"det box is not a 4-sequence: {points!r}")
        if not all(isinstance(c, (int, float)) for c in points):
            raise ValueError(f"det box has non-numeric coords: {points!r}")
        boxes.append([float(c) for c in points])
    return boxes


def scale_box(
    box: Sequence[float], width: int, height: int
) -> Optional[Tuple[int, int, int, int]]:
    """Rescale a 0..999 virtual-grid box to pixel coords.

    ``int(c/999*dim)`` per the reference (Lib/postprocessor.py:111-114,
    run_dpsk_ocr_pdf.py:176-182). Returns None for degenerate boxes
    (``x1>=x2 or y1>=y2`` skip rule, Lib/postprocessor.py:116-117).
    """
    x1, y1, x2, y2 = box
    x1 = int(x1 / 999 * width)
    y1 = int(y1 / 999 * height)
    x2 = int(x2 / 999 * width)
    y2 = int(y2 / 999 * height)
    if x1 >= x2 or y1 >= y2:
        return None
    return (x1, y1, x2, y2)


def extract_coordinates_and_label(
    ref_text: Tuple[str, str, str],
) -> Optional[Tuple[str, List[List[float]]]]:
    """(label, boxes) from one matched tag tuple; None on parse failure.

    Mirrors extract_coordinates_and_label (run_dpsk_ocr_pdf.py:139-149)
    with ``ast.literal_eval`` instead of ``eval``.
    """
    try:
        label = ref_text[1]
        coords = parse_det_coords(ref_text[2])
        return label, coords
    except Exception:
        return None
