"""A2: windowed no-repeat-ngram logits guard.

The reference configures ``NoRepeatNGramLogitsProcessor(ngram_size,
window_size, whitelist_token_ids={128821, 128822})`` on every backend
(``docker/start_server.py:366-367`` 20/50, ``run_dpsk_ocr_pdf.py:47``
20/50, ``run_dpsk_ocr_image.py:163`` 30/90,
``run_dpsk_ocr_eval_batch.py:38`` 40/90; the whitelist is the
``<td>``/``</td>`` token pair) -- but the implementation file
(``process/ngram_norepeat.py``) ships only inside the Docker image, not
in the repo. This module implements the STANDARD public semantics of a
windowed no-repeat-ngram ban (the n-gram-blocking algorithm of the
common generation libraries, restricted to a trailing window):

  a candidate next token t is banned iff appending t would make the
  last ``ngram_size`` tokens equal an n-gram that already occurs inside
  the trailing ``window_size`` tokens -- unless t is whitelisted.

Pure numpy, torch-free; the OCR actor applies it per decode step. The
whitelist exists because table markup legitimately repeats ``<td>``
runs beyond any n-gram bound.
"""

from __future__ import annotations

from typing import Iterable, Sequence, Set

import numpy as np


def banned_next_tokens(token_ids: Sequence[int], ngram_size: int,
                       window_size: int,
                       whitelist_token_ids: Iterable[int] = ()) -> Set[int]:
    """Token ids that would complete a repeated n-gram within the
    trailing window. Empty until ``ngram_size - 1`` tokens exist."""
    seq = np.asarray(token_ids, dtype=np.int64)
    n = int(ngram_size)
    if n <= 0 or len(seq) < n - 1:
        return set()
    window = seq[-int(window_size):]
    if len(window) < n:
        return set()
    prefix = seq[-(n - 1):] if n > 1 else np.empty(0, dtype=np.int64)
    if n == 1:
        # degenerate: every token in the window is a repeat
        banned = set(int(t) for t in window)
    else:
        from numpy.lib.stride_tricks import sliding_window_view

        views = sliding_window_view(window, n - 1)[:-1]  # each has a next
        hits = np.all(views == prefix[None, :], axis=1)
        banned = set(int(window[i + n - 1]) for i in np.nonzero(hits)[0])
    return banned - set(int(t) for t in whitelist_token_ids)


class NoRepeatNGramGuard:
    """Logits-processor-shaped wrapper (the vLLM calling convention:
    ``__call__(past_token_ids, logits) -> logits``): banned candidates
    are masked to -inf. Stateless across calls; config fixed at
    construction (the reference's ctor shape)."""

    def __init__(self, ngram_size: int = 20, window_size: int = 50,
                 whitelist_token_ids: Iterable[int] = (128821, 128822)):
        self.ngram_size = int(ngram_size)
        self.window_size = int(window_size)
        self.whitelist_token_ids = frozenset(
            int(t) for t in whitelist_token_ids)

    def __call__(self, past_token_ids: Sequence[int],
                 logits: np.ndarray) -> np.ndarray:
        banned = banned_next_tokens(past_token_ids, self.ngram_size,
                                    self.window_size,
                                    self.whitelist_token_ids)
        if not banned:
            return logits
        out = np.array(logits, dtype=np.float64, copy=True)
        idx = [t for t in banned if 0 <= t < len(out)]
        out[idx] = -np.inf
        return out
