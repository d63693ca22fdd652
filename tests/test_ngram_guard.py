"""A2 windowed no-repeat-ngram guard: semantics vs a brute-force
reference, whitelist exemption, window truncation, logits masking."""

import os
import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deekseek_ocr___dockerized_api_ray.functions.ngram_guard import (  # noqa: E402
    NoRepeatNGramGuard,
    banned_next_tokens,
)


def brute_force(seq, n, w, whitelist=()):
    """Ban t iff seq[-(n-1):] + [t] occurs as an n-gram in the window."""
    seq = list(seq)
    if n <= 0 or len(seq) < n - 1:
        return set()
    window = seq[-w:]
    if len(window) < n:
        return set()
    prefix = seq[-(n - 1):] if n > 1 else []
    banned = set()
    for i in range(len(window) - n + 1):
        if window[i:i + n - 1] == prefix:
            banned.add(window[i + n - 1])
    return banned - set(whitelist)


def test_simple_repeat_banned():
    # "a b c a b" with n=3: prefix (a, b) occurred before, followed by c
    seq = [1, 2, 3, 1, 2]
    assert banned_next_tokens(seq, 3, 50) == {3}
    # whitelist exempts the would-be-banned token (the <td> escape)
    assert banned_next_tokens(seq, 3, 50, whitelist_token_ids={3}) == set()


def test_window_limits_lookback():
    seq = [1, 2, 3] + [9] * 10 + [1, 2]
    assert banned_next_tokens(seq, 3, 50) == {3}
    # the old occurrence falls outside a 6-token window
    assert banned_next_tokens(seq, 3, 6) == set()


def test_too_short_sequences():
    assert banned_next_tokens([], 3, 50) == set()
    assert banned_next_tokens([1], 3, 50) == set()
    assert banned_next_tokens([1, 2], 3, 50) == set()  # window < n


def test_unigram_degenerate_case():
    assert banned_next_tokens([5, 6, 5], 1, 50) == {5, 6}


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=0, max_size=60),
       st.integers(1, 6), st.integers(2, 40))
def test_matches_brute_force(seq, n, w):
    assert banned_next_tokens(seq, n, w) == brute_force(seq, n, w)


def test_guard_masks_logits_and_blocks_greedy_repeat():
    guard = NoRepeatNGramGuard(ngram_size=3, window_size=50,
                               whitelist_token_ids=())
    logits = np.zeros(5)
    logits[3] = 10.0  # greedy would pick 3 and repeat the (1,2,3) ngram
    out = guard([1, 2, 3, 1, 2], logits)
    assert out[3] == -np.inf
    assert int(np.argmax(out)) != 3
    # untouched input when nothing is banned
    same = guard([1, 2], logits)
    assert np.array_equal(same, logits)


def test_guard_reference_ctor_shape():
    # start_server.py:367 -- ngram 20, window 50, <td>/<\td> whitelist
    g = NoRepeatNGramGuard()
    assert (g.ngram_size, g.window_size) == (20, 50)
    assert g.whitelist_token_ids == {128821, 128822}
