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
