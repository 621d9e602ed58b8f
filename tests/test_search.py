"""Inverted index + conjunctive search semantics."""

from ccdb_data_pipeline_spark.operators.search import build_inverted_index, search_and


def _docs(spark):
    rows = [
        (1, "Join the hash join club"),
        (2, "filter then join"),
        (3, "filter only, no other term"),
        (4, None),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_tf_and_tokenization(spark):
    p = {(r["token"], r["doc_id"]): r["tf"] for r in build_inverted_index(_docs(spark)).collect()}
    assert p[("join", 1)] == 2  # case-folded, counted per occurrence
    assert p[("hash", 1)] == 1
    assert ("", 5) not in p and all(d != 4 for (_, d) in p)


def test_and_search_requires_all_terms(spark):
    got = {r["doc_id"]: r["score"] for r in search_and(_docs(spark), ["JOIN", "filter"]).collect()}
    assert got == {2: 2}  # doc 1 lacks 'filter', doc 3 lacks 'join'


def test_search_prebuilt_postings_and_jvm_only(spark):
    docs = _docs(spark)
    postings = build_inverted_index(docs)
    got = {r["doc_id"] for r in search_and(docs, ["join"], postings=postings).collect()}
    assert got == {1, 2}
    plan = postings._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bm25_matches_hand_computation(spark):
    """BM25 scores equal the textbook Lucene formula computed in pure
    Python over the same tokenization (3 docs with tokens; doc without any
    query term absent from the result)."""
    import math

    from ccdb_data_pipeline_spark.operators.search import search_bm25

    got = {r["doc_id"]: (r["n_terms"], r["score"]) for r in
           search_bm25(_docs(spark), ["join", "filter"]).collect()}

    # corpus stats over docs WITH tokens: doc1 len 5, doc2 len 3, doc3 len 5
    n_docs, avgdl = 3, (5 + 3 + 5) / 3
    k1, b = 1.2, 0.75

    def idf(df):
        return math.log1p((n_docs - df + 0.5) / (df + 0.5))

    def tfn(tf, dl):
        return tf / (tf + k1 * (1 - b + b * dl / avgdl))

    df_join, df_filter = 2, 2  # docs {1,2} have 'join'; {2,3} have 'filter'
    exp = {
        1: (1, idf(df_join) * tfn(2, 5)),
        2: (2, idf(df_join) * tfn(1, 3) + idf(df_filter) * tfn(1, 3)),
        3: (1, idf(df_filter) * tfn(1, 5)),
    }
    assert set(got) == set(exp)
    for d, (n, s) in exp.items():
        assert got[d][0] == n
        assert abs(got[d][1] - s) < 1e-12
    # more matched terms on the shortest doc -> best score
    assert got[2][1] > got[1][1] > got[3][1]


def test_phrase_search_adjacency_duplicates_and_overlap(spark):
    from ccdb_data_pipeline_spark.operators.search import search_phrase

    rows = [
        (1, "big table scan"),          # phrase "big table": 1
        (2, "big, table!"),             # punctuation runs still adjacent: 1
        (3, "big red table"),           # not adjacent: 0
        (4, "table big"),               # wrong order: 0
        (5, "big table big table"),     # two occurrences
        (6, None),
        (7, "table table table"),       # "table table" overlaps: 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {r["doc_id"]: r["n_occurrences"] for r in
           search_phrase(docs, ["Big", "TABLE"]).collect()}
    assert got == {1: 1, 2: 1, 5: 2}

    dup = {r["doc_id"]: r["n_occurrences"] for r in
           search_phrase(docs, ["table", "table"]).collect()}
    assert dup == {7: 2}  # doc 5's tables are not adjacent


def test_fuzzy_candidates_and_levenshtein_verify(spark):
    from ccdb_data_pipeline_spark.operators.search import search_fuzzy

    rows = [
        (1, "table table label"),
        (2, "tabel typo here"),
        (3, "cable gable unrelated"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["token"]: (r["n_docs"], r["n_occurrences"]) for r in
           search_fuzzy(docs, "tabel").collect()}
    # 'table' is a TRANSPOSITION away (levenshtein 2): SymSpell-1 generates
    # it as a candidate but the verify step must reject it. 'label'/'cable'/
    # 'gable' are single substitutions... of 'table', not 'tabel':
    # lev(tabel,label)=1 (t->l), lev(tabel,cable)=2, lev(tabel,gable)=2.
    assert got == {"tabel": (1, 1), "label": (1, 1)}


def test_highlight_window_and_first_match(spark):
    from ccdb_data_pipeline_spark.operators.search import highlight

    rows = [
        (1, "a b c TARGET d e f g"),       # interior match, full window
        (2, "target x y z"),               # match at position 1, clamped left
        (3, "no match here"),              # absent -> filtered out
        (4, "w x y z target"),             # match at end, clamped right
        (5, "other then target and target again"),  # first match wins
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["match_pos"], r["snippet"]) for r in
           highlight(docs, ["TARGET", "other"], window=2).collect()}
    assert got[1] == (4, "b c target d e")
    assert got[2] == (1, "target x y")
    assert got[4] == (5, "y z target")
    assert got[5] == (1, "other then target")
    assert 3 not in got


def test_hybrid_rrf_fuses_both_rankings(spark):
    """RRF = 1/(k+rank_text) + 1/(k+rank_vec); a doc present in only one
    ranking contributes one term; ordering follows the fused score."""
    from ccdb_data_pipeline_spark.operators.search import hybrid_rrf

    docs = spark.createDataFrame(
        [(0, "merge merge merge"), (1, "merge once here"), (2, "nothing relevant")],
        "doc_id long, text string",
    )
    # orthogonal-ish vectors: doc 2 nearest to the query (vec_id 9), doc 0 farthest
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.7, 0.7, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (9, [0.0, 0.9, 0.1]),  # the query vector
        ],
        "vec_id long, embedding array<double>",
    )
    got = {r["doc_id"]: r for r in hybrid_rrf(docs, emb, ["merge"], query_vec_id=9, k_rrf=60).collect()}
    # text ranks: doc0=1, doc1=2 (doc2 unranked); vec ranks: doc2=1, doc1=2, doc0=3
    assert (got[0]["rank_t"], got[0]["rank_v"]) == (1, 3)
    assert (got[1]["rank_t"], got[1]["rank_v"]) == (2, 2)
    assert (got[2]["rank_t"], got[2]["rank_v"]) == (None, 1)
    exp = {d: round((1 / (60 + rt) if rt else 0) * 1e9 + (1 / (60 + rv)) * 1e9)
           for d, rt, rv in [(0, 1, 3), (1, 2, 2), (2, None, 1)]}
    for d in (0, 1, 2):
        assert abs(got[d]["rrf_u"] - exp[d]) <= 1


def test_phrase_search_property_vs_python(spark):
    """Property check: search_phrase == a naive Python sliding-window count
    over randomized token streams (hypothesis-driven corpus, one Spark
    round-trip for all examples)."""
    from hypothesis import given, settings, strategies as st

    from ccdb_data_pipeline_spark.operators.search import search_phrase

    words = ["a", "b", "c", "aa"]

    @settings(max_examples=8, deadline=None)
    @given(
        docs=st.lists(st.lists(st.sampled_from(words), min_size=0, max_size=12),
                      min_size=1, max_size=6),
        phrase=st.lists(st.sampled_from(words), min_size=1, max_size=3),
    )
    def check(docs, phrase):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        sdf = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["n_occurrences"] for r in search_phrase(sdf, phrase).collect()}
        exp = {}
        for i, toks in enumerate(docs):
            n = sum(1 for j in range(len(toks) - len(phrase) + 1)
                    if toks[j:j + len(phrase)] == phrase)
            if n:
                exp[i] = n
        assert got == exp

    check()


def test_fuzzy_property_vs_python_levenshtein(spark):
    """Property check: search_fuzzy's candidate set == a direct Levenshtein
    scan of the vocabulary, over randomized short tokens (where the SymSpell
    neighborhood's false-positive modes — transpositions, double edits —
    are densest)."""
    from hypothesis import given, settings, strategies as st

    from ccdb_data_pipeline_spark.operators.search import search_fuzzy

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    alpha = "ab"

    @settings(max_examples=8, deadline=None)
    @given(
        vocab=st.lists(st.text(alphabet=alpha, min_size=1, max_size=4),
                       min_size=1, max_size=8),
        term=st.text(alphabet=alpha, min_size=1, max_size=4),
    )
    def check(vocab, term):
        rows = [(i, w) for i, w in enumerate(vocab)]
        sdf = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["token"] for r in search_fuzzy(sdf, term).collect()}
        exp = {w for w in set(vocab) if lev(w, term.lower()) <= 1}
        assert got == exp

    check()
