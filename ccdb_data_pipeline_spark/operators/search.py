"""Full-text search: distributed inverted index + conjunctive query.

The reference's whole purpose is feeding an Elasticsearch text index
(/root/reference/complaints/ccdb/index_ccdb.py:150-178 builds the index,
search happens in ES). Spark-first, the same capability is an inverted
index MATERIALIZED AS A TABLE — token -> posting list — built with
tokenize/explode/groupBy (all JVM, one shuffle on token), and boolean
retrieval as joins against it. At 100 TB the postings build is
embarrassingly parallel and the only shuffle is the groupBy(token);
query-time AND is a semi-join per term over the token-partitioned postings
(each term touches one partition's worth of postings, not the corpus).

Tokenization is deliberately the simplest cross-engine-reproducible rule —
lowercase, split on runs of non-alphanumerics — so a SQL oracle can
reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per (doc, token occurrence) — the map side of the index."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)).alias("token"),
        )
        .filter(F.col("token") != "")
    )


def build_inverted_index(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Postings table: (token, doc_id, tf), partitioned by the groupBy's
    token hash. Write it bucketed by token for shuffle-free query joins."""
    return (
        tokens(df, text_col, id_col)
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def incremental_postings(spark, root: str, key_cols=("conv_id", "turn_idx"),
                         text_col: str = "text"):
    """An inverted index MAINTAINED FROM THE CHANGE FEED: (token, *key) ->
    tf, refreshed in O(changed rows) per batch via the signed pre/post-image
    IVM algebra (plans/ivm.py). An updated turn retracts its old tokens and
    adds its new ones; a deleted turn's postings drop out when tf hits 0.
    This is the engine's analog of the reference's whole purpose — keeping a
    text index fresh from delta pulls (index_ccdb.py:121-147) — at corpus
    scale without rescans. Call ``.refresh(table)`` after each applied batch
    (or from the stream's ``on_batch``); query with :func:`search_and`
    passing ``postings=view.read().withColumnRenamed(...)`` as needed."""
    from ..plans.ivm import IncrementalAggView

    return IncrementalAggView(
        spark,
        root,
        group_cols=["token", *key_cols],
        explode_cols={"token": f"split(lower({text_col}), '{_TOKEN_SPLIT}')"},
        row_filter="token <> ''",
    )


def positional_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, token, pos) with pos = index in the RAW split array. The
    split regex uses a + quantifier, so interior empties are impossible —
    only a leading/trailing delimiter yields "" (filtered out). Raw indices
    are kept (not renumbered) so two tokens are textually adjacent exactly
    when their positions are consecutive."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)).alias(
                "pos", "token"
            ),
        )
        .filter(F.col("token") != "")
    )


def search_phrase(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Exact-phrase retrieval (the ES match_phrase analog) over positional
    postings: (doc_id, n_occurrences) for docs containing the token sequence
    consecutively. The classic positional-index linearization: the i-th
    phrase term's postings are shifted to anchor = pos - i, and an anchor
    where ALL |phrase| term-slots land is an occurrence — one aggregation on
    (doc_id, anchor), no self-join chain. Duplicate terms in the phrase are
    handled by slot index (counting distinct slots, not distinct tokens);
    overlapping occurrences each count. At corpus scale the postings are
    token-pruned to the phrase's terms before the shuffle."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    terms = [t.lower() for t in phrase]
    p = postings if postings is not None else positional_tokens(df, text_col, id_col)
    p = p.filter(F.col("token").isin(sorted(set(terms))))
    slots = None
    for i, t in enumerate(terms):
        s = p.filter(F.col("token") == t).select(
            "doc_id", (F.col("pos") - F.lit(i)).alias("anchor"), F.lit(i).alias("slot")
        )
        slots = s if slots is None else slots.unionByName(s)
    return (
        slots.groupBy("doc_id", "anchor")
        .agg(F.countDistinct("slot").alias("_n"))
        .filter(F.col("_n") == len(terms))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def search_bm25(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    postings: DataFrame | None = None,
    doc_lens: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 ranked (disjunctive) retrieval — the scoring the
    reference's sink actually runs on every query (OpenSearch/Lucene default
    similarity; the index built at index_ccdb.py:150-168 is searched with
    BM25). Output: (doc_id, n_terms, score) for every doc containing ANY
    query term, using Lucene's idf = ln(1 + (N - df + 0.5)/(df + 0.5)) and
    tf norm tf/(tf + k1*(1 - b + b*dl/avgdl)).

    Plan shape at corpus scale: postings filtered to |q| terms (token-hash
    pruned), per-term df aggregated from that SMALL slice and broadcast
    back; corpus stats (N, avgdl) are a 1-row broadcast cross join; doc
    lengths join on doc_id. No stage touches more than the matched docs
    except the doc-length build, which is the same single groupBy that
    builds the index (pass ``doc_lens``/``postings`` from a materialized
    index to skip both).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    norm = sorted({t.lower() for t in terms})
    if postings is None or doc_lens is None:
        tok = tokens(df, text_col, id_col)
    p = postings if postings is not None else tok.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = doc_lens if doc_lens is not None else tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = p.filter(F.col("token").isin(norm))
    dfreq = hits.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log1p(
                (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_tfn",
            F.col("tf")
            / (F.col("tf") + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.col("_idf") * F.col("_tfn")).alias("score"),
    )


def _deletion_variants(c):
    """token -> array of the token itself + every single-character deletion
    (the SymSpell neighborhood), all JVM-side: transform over an index
    sequence, no UDF."""
    return F.expr(
        f"array_union(array({c}), transform(sequence(1, length({c})), "
        f"i -> concat(substring({c}, 1, i - 1), substring({c}, i + 1, length({c})))))"
    )


def search_fuzzy(
    df: DataFrame,
    term: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_edits: int = 1,
    postings: DataFrame | None = None,
) -> DataFrame:
    """Fuzzy term retrieval (the ES ``fuzziness: 1`` analog): corpus tokens
    within Levenshtein distance ``max_edits`` (1) of the query term, with
    doc and occurrence counts. SymSpell candidate generation: two strings
    are within edit distance 1 iff their single-deletion neighborhoods
    intersect, so the vocabulary is probed with one map-side explode +
    filter against the query's (tiny, driver-computed) variant set — never
    a corpus-wide levenshtein scan. Candidates are then re-verified with
    the built-in ``levenshtein`` (kills SymSpell false positives such as
    transpositions, which are distance 2), so the result set is EXACTLY the
    levenshtein-filtered vocabulary."""
    if max_edits != 1:
        raise ValueError("only max_edits=1 is supported (SymSpell-1 neighborhood)")
    t = term.lower()
    qvars = sorted({t} | {t[:i] + t[i + 1:] for i in range(len(t))})
    p = postings if postings is not None else build_inverted_index(df, text_col, id_col)
    vocab = p.select("token").distinct()
    cand = (
        vocab.select("token", F.explode(_deletion_variants("token")).alias("v"))
        .filter(F.col("v").isin(qvars))
        .select("token")
        .distinct()
        .filter(F.levenshtein(F.col("token"), F.lit(t)) <= max_edits)
    )
    return (
        p.join(F.broadcast(cand), "token")
        .groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("tf").alias("n_occurrences"),
        )
    )


def highlight(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
) -> DataFrame:
    """Snippet extraction (the ES highlight analog): for each doc containing
    any query term, the ``window`` tokens either side of the FIRST match,
    space-joined. Entirely JVM array expressions over the tokenized text —
    per-row work is O(tokens), no shuffle at all (the one groupBy-free
    operator in the search family: a pure projection + filter)."""
    if not terms:
        raise ValueError("terms must be non-empty")
    norm = sorted({t.lower() for t in terms})
    arr = f"filter(split(lower({text_col}), '{_TOKEN_SPLIT}'), x -> x <> '')"
    firsts = [f"nullif(array_position({arr}, '{t}'), 0)" for t in norm]
    pos = f"least({', '.join(firsts)})" if len(firsts) > 1 else firsts[0]
    b = f"greatest(1, {pos} - {window})"
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.expr(pos).cast("int").alias("match_pos"),
            F.expr(
                f"array_join(slice({arr}, {b}, {pos} + {window} - {b} + 1), ' ')"
            ).alias("snippet"),
        )
        .filter(F.col("match_pos").isNotNull())
    )


def bm25_over_incremental(view, terms: list[str], key_cols=("conv_id", "turn_idx")) -> DataFrame:
    """BM25 ranked retrieval served from the INCREMENTALLY-maintained
    postings (incremental_postings / plans/ivm.py): the index stays fresh in
    O(changed rows) per batch, and query time derives doc lengths from the
    same postings state (dl = sum tf per doc) — no rescan of the corpus at
    either index or query time. This closes the reference's full loop:
    delta pull -> index refresh -> ranked query (index_ccdb.py:121-147 + the
    sink's BM25 scoring), all engine-side."""
    from pyspark.sql import functions as _F

    p = view.read()
    did = _F.concat_ws("#", *[_F.col(k) for k in key_cols])
    postings = p.select("token", did.alias("doc_id"), _F.col("n_rows").alias("tf"))
    doc_lens = postings.groupBy("doc_id").agg(_F.sum("tf").alias("dl"))
    return search_bm25(None, terms, postings=postings, doc_lens=doc_lens)


def hybrid_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec_id: int,
    k_rrf: int = 60,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking fused with embedding-cosine
    ranking by reciprocal-rank fusion — fused(d) = sum over present sides of
    1/(k_rrf + rank). The standard way modern search stacks combine a text
    index with a vector index; rank-based fusion needs no score calibration
    between the two spaces. Both per-side rankings order by INTEGERIZED
    scores (1e-6 BM25, basis-point cosine) with id tie-breaks, so the
    fusion is deterministic and cross-engine reproducible. The vector side
    here is the exact brute-force ranking (the oracle-checkable baseline);
    at corpus scale swap in the IVF-pruned ranking
    (operators/similarity.py ivf_topk) — the fusion is rank-only and does
    not care how either list was produced."""
    from pyspark.sql import Window as _W

    from .similarity import brute_force_topk

    bm = search_bm25(docs, terms, text_col=text_col, id_col=id_col).select(
        "doc_id", F.round(F.col("score") * 1e6).cast("long").alias("score_u")
    )
    rt = bm.select(
        "doc_id",
        F.row_number()
        .over(_W.orderBy(F.desc("score_u"), "doc_id"))
        .cast("long")
        .alias("rank_t"),
    )
    q = embeddings.filter(F.col(vec_id_col) == query_vec_id)
    rv = brute_force_topk(
        embeddings, q, id_col=vec_id_col, vec_col=vec_col, k=1 << 30
    ).select(F.col("neighbor_id").alias("doc_id"), F.col("rank").cast("long").alias("rank_v"))
    one = F.lit(1).cast("double")
    fused = F.coalesce(one / (F.lit(k_rrf) + F.col("rank_t")), F.lit(0.0)) + F.coalesce(
        one / (F.lit(k_rrf) + F.col("rank_v")), F.lit(0.0)
    )
    return (
        rt.join(rv, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(fused * 1e9).cast("long").alias("rrf_u"),
            F.col("rank_t"),
            F.col("rank_v"),
        )
        .orderBy(F.desc("rrf_u"), "doc_id")
        .limit(top_k)
    )


def search_and(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Conjunctive (AND) retrieval: docs containing EVERY term, scored by
    total term frequency. One aggregation over the filtered postings —
    `HAVING count(distinct token) = |terms|` is the classic postings-join
    linearization (no N-way self-join). Pass a prebuilt ``postings`` table
    to search an already-materialized index."""
    if not terms:
        raise ValueError("terms must be non-empty")
    norm = sorted({t.lower() for t in terms})
    p = postings if postings is not None else build_inverted_index(df, text_col, id_col)
    return (
        p.filter(F.col("token").isin(norm))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .filter(F.col("n_terms") == len(norm))
        .drop("n_terms")
    )
