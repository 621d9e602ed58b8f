"""Winnowing fingerprint: the numpy-vectorized implementation must match a
naive pure-Python reference of the same definition (Schleimer et al. window
minima over polynomial k-gram hashes), and the mapInPandas plumbing must be
deterministic."""

import numpy as np

from ccdb_data_pipeline_spark.functions.text_analysis import (
    _WINNOW_BASE,
    _WINNOW_MOD,
    _winnow_one,
    fingerprint_winnow,
)


def _naive_winnow(text: str, k: int = 5, w: int = 4):
    s = " ".join(str(text).split())
    if len(s) < k:
        return 0, 0, 0
    hs = []
    for i in range(len(s) - k + 1):
        h = 0
        for ch in s[i : i + k]:
            h = (h * _WINNOW_BASE + ord(ch)) % _WINNOW_MOD
        hs.append(h)
    picks = set()
    for i in range(max(1, len(hs) - w + 1)):
        picks.add(min(hs[i : i + w]))
    x = 0
    for p in picks:
        x ^= p
    return len(picks), min(picks), x


def test_winnow_matches_naive_reference():
    cases = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaa",  # degenerate repeats
        "ab",  # shorter than k -> (0,0,0)
        "abcdef",  # fewer hashes than the window width
        "unicode éè中文 mixed in",
        "  doubled   spaces\tand\ntabs  ",
    ]
    for t in cases:
        assert _winnow_one(t) == _naive_winnow(t), t


def test_winnow_is_vectorized_fast():
    # 200 x 1kB docs must fingerprint in well under a second (the old
    # per-k-gram hashlib loop took ~10ms per kB)
    import time

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = [" ".join(rng.choice(words, 200)) for _ in range(200)]
    t0 = time.perf_counter()
    for d in docs:
        _winnow_one(d)
    assert time.perf_counter() - t0 < 1.0


def test_fingerprint_winnow_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"), (2, "ab"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in fingerprint_winnow(df, "doc_id", "text").collect()}
    exp = _naive_winnow("the quick brown fox jumps over the lazy dog")
    assert (rows[1]["n_fingerprints"], rows[1]["fp_min"], rows[1]["fp_xor"]) == exp
    assert rows[2]["n_fingerprints"] == 0 and rows[3]["n_fingerprints"] == 0


def test_winnow_batch_parity_with_per_doc():
    """The whole-batch winnowing formulation (round-3: no per-doc Python
    dispatch for short docs) must equal the per-doc reference bit-for-bit
    across edge cases and k/w settings."""
    import random

    import numpy as np
    import pandas as pd

    from ccdb_data_pipeline_spark.functions.text_analysis import (
        _winnow_batch,
        _winnow_one,
    )

    random.seed(3)
    rand = lambda n: "".join(random.choice("ab cde f\tg\n") for _ in range(n))  # noqa: E731
    texts = ["", "ab", "abcd", "abcde", "aaaaaaaaaa", "  sp   aces ", None] + [
        rand(n) for n in (3, 5, 6, 7, 8, 10, 20, 50, 200, 1000)
    ]
    s = pd.Series(texts)
    for k, w in [(5, 4), (3, 2), (7, 9), (2, 1)]:
        n_fp, mn, xr = _winnow_batch(s, k, w)
        for i, t in enumerate(texts):
            want = _winnow_one("" if t is None else t, k, w)
            assert (int(n_fp[i]), int(mn[i]), int(xr[i])) == want, (k, w, i, t)
