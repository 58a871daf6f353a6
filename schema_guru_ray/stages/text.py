"""Text-analysis kernels for large-scale training-data pipelines: token
counting, quality scoring, document fingerprinting, language ID.

All are vectorized ``map_batches`` kernels over pandas/numpy (string-heavy
kernels want pandas' str engine); stateful pieces (compiled regexes,
stopword tables, n-gram profiles) live in callable-class ``__init__`` so an
actor pool pays setup once (SURVEY.md §2.3).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = re.compile(r"\S+")
WORD_RE = re.compile(r"[\w']+", re.UNICODE)
PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")

# small per-language stopword profiles (public common-word lists)
_STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the of and to in a is that it was for on are with as be at by this had not".split()),
    "de": frozenset("der die das und ist in den von zu mit sich des auf für nicht eine als auch es an".split()),
    "fr": frozenset("le la les de des et un une du en est que qui dans pour sur au avec ne se ce".split()),
    "es": frozenset("el la los las de y un una en es que se del por con para su al lo como más".split()),
    "it": frozenset("il la le di e un una in è che si per con del non sono da come dei più anche".split()),
    "pt": frozenset("o a os as de e um uma em é que se do da por com para não os uma mais como".split()),
}


class TokenCounter:
    """Whitespace tokens + BPE-ish word-piece count per document.

    ``n_tokens`` counts ``\\S+`` runs (matches the DuckDB oracle
    ``len(regexp_extract_all(text, '\\S+'))``); ``n_wordpieces`` is a
    BPE-like proxy: words are split into ceil(len/4) pieces, digits and
    punctuation count singly — a deterministic stand-in for a real
    tokenizer's piece count."""

    def __init__(self, column: str = "text", id_column: str = "doc_id"):
        self.column = column
        self.id_column = id_column

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.column].fillna("")
        n_tokens = text.str.count(TOKEN_RE).astype("int64")
        words = text.str.findall(WORD_RE)
        n_pieces = words.map(lambda ws: sum((len(w) + 3) // 4 for w in ws)) + text.str.count(
            PUNCT_RE
        )
        return pd.DataFrame(
            {
                self.id_column: batch[self.id_column],
                "n_tokens": n_tokens,
                "n_wordpieces": n_pieces.astype("int64"),
            }
        )


class QualityScorer:
    """Heuristic document-quality features (length / punctuation / stopword /
    repetition ratios) — the standard pre-training quality-filter family."""

    def __init__(self, column: str = "text", id_column: str = "doc_id"):
        self.column = column
        self.id_column = id_column
        self.stop_en = _STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.column].fillna("")
        n_chars = text.str.len().astype("int64")
        tokens = text.str.lower().str.findall(WORD_RE)
        n_words = tokens.map(len)
        mean_word_len = tokens.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        stop_ratio = tokens.map(
            lambda ws: sum(w in self.stop_en for w in ws) / len(ws) if ws else 0.0
        )
        uniq_ratio = tokens.map(lambda ws: len(set(ws)) / len(ws) if ws else 0.0)
        n_punct = text.str.count(PUNCT_RE)
        punct_ratio = (n_punct / n_chars.clip(lower=1)).astype("float64")
        return pd.DataFrame(
            {
                self.id_column: batch[self.id_column],
                "n_chars": n_chars,
                "n_words": n_words.astype("int64"),
                "mean_word_len": mean_word_len.astype("float64"),
                "stopword_ratio": stop_ratio.astype("float64"),
                "unique_word_ratio": uniq_ratio.astype("float64"),
                "punct_ratio": punct_ratio,
            }
        )


class Fingerprinter:
    """Document fingerprints.

    * ``fp_md5``: md5 of whitespace-normalized lowercase text — the exact-dup
      key; SQL-expressible (``md5(lower(regexp_replace(text,'\\s+',' ','g')))``).
    * ``fp_winnow``: winnowing fingerprint (Schleimer et al. 2003): rolling
      64-bit hashes over character 8-grams, minimum per window of 16,
      xor-folded — a compact near-dup-robust digest (hex)."""

    K = 8
    W = 16
    _MOD = (1 << 61) - 1
    _BASE = 257

    def __init__(self, column: str = "text", id_column: str = "doc_id"):
        self.column = column
        self.id_column = id_column

    @staticmethod
    def _normalize(s: str) -> str:
        return re.sub(r"\s+", " ", s).lower().strip()

    def _winnow(self, s: str) -> int:
        data = np.frombuffer(s.encode("utf-8", "ignore"), dtype=np.uint8)
        n = data.size
        if n < self.K:
            return int(hashlib.blake2b(s.encode(), digest_size=8).hexdigest(), 16)
        # rolling polynomial hashes of all k-grams (vectorized via cumulative
        # powers in float-free integer arithmetic)
        h = np.zeros(n - self.K + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):  # mod-2^64 rolling hash
            acc = np.uint64(0)
            basek = pow(self._BASE, self.K - 1, 1 << 64)
            vals = data.astype(np.uint64)
            for i in range(self.K):
                acc = acc * np.uint64(self._BASE) + vals[i]
            h[0] = acc
            b = np.uint64(self._BASE)
            bk = np.uint64(basek)
            for i in range(1, n - self.K + 1):
                acc = (acc - vals[i - 1] * bk) * b + vals[i + self.K - 1]
                h[i] = acc
        # winnow: min hash of each window, deduped
        if h.size <= self.W:
            mins = np.array([h.min()], dtype=np.uint64)
        else:
            win = np.lib.stride_tricks.sliding_window_view(h, self.W)
            mins = np.unique(win.min(axis=1))
        with np.errstate(over="ignore"):  # uint64 wrap-around is intended
            out = np.uint64(0)
            for m in mins:
                out ^= m * np.uint64(0x9E3779B97F4A7C15)
        return int(out)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch[self.column].fillna("")
        norm = text.map(self._normalize)
        fp_md5 = norm.map(lambda s: hashlib.md5(s.encode()).hexdigest())
        fp_winnow = norm.map(lambda s: format(self._winnow(s), "016x"))
        return pd.DataFrame(
            {
                self.id_column: batch[self.id_column],
                "fp_md5": fp_md5,
                "fp_winnow": fp_winnow,
            }
        )


class TextCleaner:
    """Canonical text normalization (the cleaning stage of a curation
    pipeline): NFC unicode normalization → control-character strip →
    whitespace collapse → trim. Emits the cleaned text plus its md5 and
    length so downstream exact-dedup keys are normalization-stable.
    Exactly SQL-replayable (DuckDB ``nfc_normalize`` + regexp_replace)."""

    _CTRL = re.compile(r"[\x00-\x1f\x7f]")
    _WS = re.compile(r"\s+")

    def __init__(self, column: str = "text", id_column: str = "doc_id"):
        self.column = column
        self.id_column = id_column

    def clean_one(self, s: str) -> str:
        import unicodedata

        s = unicodedata.normalize("NFC", s)
        s = self._CTRL.sub("", s)
        return self._WS.sub(" ", s).strip()

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        cleaned = batch[self.column].fillna("").map(self.clean_one)
        return pd.DataFrame(
            {
                self.id_column: batch[self.id_column],
                "clean_text": cleaned,
                "clean_md5": cleaned.map(
                    lambda s: hashlib.md5(s.encode()).hexdigest()
                ),
                "n_chars_clean": cleaned.str.len().astype("int64"),
            }
        )


class LangId:
    """Language identification: stopword-hit scoring with a character
    trigram fallback — the classic lightweight n-gram heuristic (rows-only
    check: not SQL-expressible). Emits (id, lang_pred, lang_score)."""

    def __init__(self, column: str = "text", id_column: str = "doc_id"):
        self.column = column
        self.id_column = id_column
        self.profiles = {k: v for k, v in _STOPWORDS.items()}

    def _score(self, text: str):
        words = WORD_RE.findall(text.lower())
        if not words:
            return "und", 0.0
        best_lang, best = "und", 0.0
        for lang, stops in self.profiles.items():
            hits = sum(w in stops for w in words)
            score = hits / len(words)
            if score > best:
                best_lang, best = lang, score
        return (best_lang if best > 0.02 else "und"), float(best)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        scored = batch[self.column].fillna("").map(self._score)
        return pd.DataFrame(
            {
                self.id_column: batch[self.id_column],
                "lang_pred": scored.map(lambda t: t[0]),
                "lang_score": scored.map(lambda t: t[1]),
            }
        )
