"""Text-analysis primitives for large-scale training-data pipelines.

Beyond the reference's own operators (it has none of these), a 100 TB
corpus pipeline needs language ID, quality scoring, token counting and
fingerprinting. All functions are batch-vectorized (numpy / list
comprehension over one Arrow column) and pure, so they run in stateless
``map_batches`` tasks; regexes compile once at module import.

Where a DuckDB oracle exists, the Python semantics here are chosen to be
exactly SQL-replicable (same regex class, same rounding) -- see
__ray_entry__.oracle_sql.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Sequence

#: SQL-replicable token pattern: runs of non-whitespace.
TOKEN_RE = re.compile(r"\S+")
#: BPE-ish subword pattern (GPT-2-style contractions + word/number/punct runs).
BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")
#: SQL-replicable punctuation class.
PUNCT_RE = re.compile(r"[.,;:!?]")
#: SQL-replicable stopword pattern (word-boundary alternation, lowercase input).
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")
STOPWORD_RE = re.compile(r"\b(?:" + "|".join(STOPWORDS) + r")\b")
_WS_RUN_RE = re.compile(r"\s+")

# language-ID heuristic tables: high-frequency function words per language
_LANG_MARKERS: Dict[str, frozenset] = {
    "en": frozenset("the and of to in is you that it for was with his they at".split()),
    "de": frozenset("der die das und ist nicht ein eine ich sie mit von für auf".split()),
    "fr": frozenset("le la les et est une je vous pas pour dans qui sur avec".split()),
    "es": frozenset("el la los las y es una que no por para con su del se".split()),
}
_WORD_RE = re.compile(r"[a-zA-Zäöüßéèêàçñáíóú]+")


def token_count(text: str) -> int:
    """Whitespace-token count; oracle: len(regexp_extract_all(text, '\\S+'))."""
    return len(TOKEN_RE.findall(text))


def bpe_token_count(text: str) -> int:
    """BPE-ish subword count via a GPT-2-style pre-tokenizer regex."""
    return len(BPE_RE.findall(text))


def punct_count(text: str) -> int:
    return len(PUNCT_RE.findall(text))


def stopword_count(text: str) -> int:
    return len(STOPWORD_RE.findall(text.lower()))


def quality_metrics(text: str) -> Dict[str, float]:
    """Boilerplate-style quality signals (length / punctuation / stopword
    ratios), the text-density analog of Boilerpipe heuristics.

    Rounding to 6 decimals keeps the values hash-identical with the SQL
    oracle's ROUND(..., 6).
    """
    from .rounding import round_half_away

    n_chars = len(text)
    n_tokens = token_count(text)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": round_half_away(n_chars / n_tokens, 6) if n_tokens else 0.0,
        "punct_ratio": round_half_away(punct_count(text) / n_chars, 6) if n_chars else 0.0,
        "stopword_ratio": round_half_away(stopword_count(text) / n_tokens, 6) if n_tokens else 0.0,
    }


def detect_language(text: str) -> str:
    """n-gram/function-word language heuristic.

    CJK codepoint share decides zh/ja/ko-ish ("zh" bucket here); otherwise
    the language whose marker-word hit rate is highest wins; ties and
    no-hits fall back to "und" (undetermined).
    """
    if not text:
        return "und"
    n_cjk = sum(1 for c in text if "一" <= c <= "鿿")
    if n_cjk / max(1, len(text)) > 0.05:
        return "zh"
    words = _WORD_RE.findall(text.lower())
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        hits = sum(1 for w in words if w in markers)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits > 0 else "und"


def normalize_for_fingerprint(text: str) -> str:
    """lower + collapse whitespace -- oracle: regexp_replace(lower(x),'\\s+',' ','g')."""
    return _WS_RUN_RE.sub(" ", text.lower())


def md5_fingerprint(text: str) -> str:
    """Content fingerprint: md5 of normalized text (oracle: md5(...))."""
    return hashlib.md5(normalize_for_fingerprint(text).encode("utf-8")).hexdigest()


def rolling_fingerprint(text: str, window: int = 16, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash over the normalized text (winnowing-style
    document fingerprint base); deterministic, no SQL oracle."""
    norm = normalize_for_fingerprint(text)
    h = 0
    for ch in norm:
        h = (h * 131 + ord(ch)) % mod
    return h


def sha1_64(text: str) -> int:
    """Stable 64-bit content hash (exact-dedup key)."""
    return int.from_bytes(hashlib.sha1(text.encode("utf-8")).digest()[:8], "big")


def repetition_metrics(text: str) -> Dict[str, float]:
    """Gopher-style repetition signals (Rae et al. 2021, section A1.1):
    duplicate-line fractions and the top word-2-gram character fraction.
    Exact SQL-replicable definitions (see __ray_entry__.oracle_sql):

      dup_line_frac       (n_lines - n_distinct_lines) / n_lines
      dup_line_char_frac  chars in repeat occurrences of a line /
                          total line chars: sum((cnt-1)*len) / sum(cnt*len)
      top_2gram_char_frac count(top 2-gram) * len(top 2-gram) /
                          len(text); ties -> lexicographically smallest

    All r6 half-away; empty denominators -> 0.0.
    """
    from collections import Counter

    from .rounding import round_half_away

    lines = text.split("\n")
    n_lines = len(lines)
    line_counts = Counter(lines)
    dup_line_frac = (n_lines - len(line_counts)) / n_lines if n_lines else 0.0
    total_line_chars = sum(len(ln) for ln in lines)
    dup_chars = sum((c - 1) * len(ln) for ln, c in line_counts.items())
    dup_line_char_frac = dup_chars / total_line_chars if total_line_chars else 0.0

    words = TOKEN_RE.findall(text)
    top_frac = 0.0
    if len(words) >= 2 and text:
        grams = Counter(
            " ".join(words[i : i + 2]) for i in range(len(words) - 1)
        )
        best_cnt = max(grams.values())
        best = min(g for g, c in grams.items() if c == best_cnt)
        top_frac = best_cnt * len(best) / len(text)
    return {
        "dup_line_frac": round_half_away(dup_line_frac, 6),
        "dup_line_char_frac": round_half_away(dup_line_char_frac, 6),
        "top_2gram_char_frac": round_half_away(top_frac, 6),
    }


#: RE2-safe scrub patterns (no lookaround) -- identical semantics in
#: Python re and DuckDB regexp_replace/extract_all.
EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
URL_RE = re.compile(r"https?://[^\s]+")
PHONE_RE = re.compile(r"\+?[0-9][0-9()\-\. ]{7,}[0-9]")

#: Pattern strings for the SQL oracle (same source text as above).
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PAT = r"https?://[^\s]+"
PHONE_PAT = r"\+?[0-9][0-9()\-\. ]{7,}[0-9]"


def scrub_pii(text: str) -> Dict[str, object]:
    """Scrub emails/URLs/phone-shaped runs to placeholder tokens and
    count them (C4/CCNet-style web cleanup). Order matters and is fixed:
    URL first (emails inside URLs scrub as part of the URL), then email,
    then phone -- the SQL oracle applies the same order."""
    n_urls = len(URL_RE.findall(text))
    out = URL_RE.sub("<URL>", text)
    n_emails = len(EMAIL_RE.findall(out))
    out = EMAIL_RE.sub("<EMAIL>", out)
    n_phones = len(PHONE_RE.findall(out))
    out = PHONE_RE.sub("<PHONE>", out)
    return {"scrubbed": out, "n_urls": n_urls, "n_emails": n_emails,
            "n_phones": n_phones}
