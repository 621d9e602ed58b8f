"""Text analysis for training-data pipelines: language-ID, quality scoring,
document fingerprinting — JVM expressions where possible, Arrow pandas UDFs
where genuinely stateful (rolling-hash winnowing)."""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# marker words per language; precedence = dict order for deterministic ties
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "nicht", "ist"],
    "fr": ["le", "et", "la", "les", "est"],
    "es": ["el", "y", "los", "las", "es"],
    "zh": [],  # handled by CJK character presence
}


def lang_scores(text_col) -> dict[str, F.Column]:
    """Marker-hit counts per language (regexp_count — codegen'd)."""
    lt = F.lower(text_col)
    out = {}
    for lang, words in LANG_MARKERS.items():
        if words:
            pat = r"\b(" + "|".join(words) + r")\b"
            out[lang] = F.regexp_count(lt, F.lit(pat))
        else:
            out[lang] = F.regexp_count(text_col, F.lit(r"[一-鿿]")) * 5
    return out


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Heuristic n-gram/marker language ID with deterministic argmax."""
    scores = lang_scores(F.col(text_col))
    langs = list(scores)
    pred = None
    # fixed-precedence argmax: first language whose score >= all others
    for i, lang in enumerate(langs):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise("und")
    df = df.withColumn(out_col, pred)
    return df


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / stopword signals + a composite score in
    basis points — the training-data quality filter."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(F.split(F.trim(F.regexp_replace(t, r"\s+", " ")), " "))
    # single-char classes via translate (codegen byte-table), not regex
    n_digits = F.length(t) - F.length(F.translate(t, "0123456789", ""))
    n_punct = F.length(t) - F.length(F.translate(t, ".,;:!?", ""))
    n_stop = F.regexp_count(F.lower(t), F.lit(r"\b(the|a|and|of|to|is|in)\b"))
    tok = F.greatest(n_tokens, F.lit(1))
    score = (
        F.least(n_tokens / 200.0, F.lit(1.0)) * 4000
        + F.least(n_stop * 3.0 / tok, F.lit(1.0)) * 3000
        + (1 - F.least(n_digits * 5.0 / F.greatest(n_chars, F.lit(1)), F.lit(1.0))) * 3000
    )
    return df.select(
        *df.columns,
        n_chars.alias("q_n_chars"),
        n_tokens.alias("q_n_tokens"),
        n_digits.alias("q_n_digits"),
        n_punct.alias("q_n_punct"),
        n_stop.alias("q_n_stopwords"),
        F.round(score).cast("long").alias("quality_bp"),
    )


# ------------------------------------------------------- winnowing fingerprint

_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_fingerprints", T.IntegerType()),
        T.StructField("fp_min", T.LongType()),
        T.StructField("fp_xor", T.LongType()),
    ]
)


# polynomial k-gram hash parameters, chosen so DuckDB BIGINT arithmetic can
# mirror them exactly (h*BASE + code < 2^30 * 2^9 + 2^21 — never overflows):
# h = fold(codepoints, h -> (h*BASE + code) % MOD)
_WINNOW_MOD = 1_000_000_007
_WINNOW_BASE = 257
_WS_RUN = re.compile(r"\s+")


def _winnow_one(text: str, k: int = 5, w: int = 4) -> tuple[int, int, int]:
    """Winnowing (Schleimer et al., SIGMOD'03): k-gram polynomial hashes,
    window-min fingerprint set — fully numpy-vectorized (no per-k-gram
    hashing calls; the k-gram hash array is built in k vectorized passes
    and the window minimum via a stride-tricks sliding view)."""
    s = _WS_RUN.sub(" ", str(text)).strip()
    n = len(s)
    if n < k:
        return 0, 0, 0
    # utf-32-le reinterpretation = vectorized per-character code points
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.int64)
    for j in range(k):
        h = (h * _WINNOW_BASE + codes[j : j + m]) % _WINNOW_MOD
    if m >= w:
        wins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
    else:
        wins = h.min(keepdims=True)
    picks = np.unique(wins)
    return int(picks.size), int(picks[0]), int(np.bitwise_xor.reduce(picks))


def fingerprint_winnow(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       k: int = 5, w: int = 4) -> DataFrame:
    """Document fingerprinting via winnowing — mapInPandas (Arrow batches;
    the rolling window is inherently sequential per doc, the canonical
    pandas-UDF case per SURVEY 2.8)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            res = [_winnow_one(t, k, w) for t in b[text_col].fillna("")]
            yield pd.DataFrame(
                {
                    "doc_id": b[id_col].astype("int64"),
                    "n_fingerprints": [r[0] for r in res],
                    "fp_min": [r[1] for r in res],
                    "fp_xor": [r[2] for r in res],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=_FP_SCHEMA)
