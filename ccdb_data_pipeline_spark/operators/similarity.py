"""Similarity search over embedding columns (array<float>).

Two tiers, both pure DataFrame ops (dot products via zip_with/aggregate —
JVM-side, no Python in the hot path):

- brute_force_topk: broadcast the (small) query set against the corpus —
  the exact baseline. Scales linearly in corpus size; the shuffle-free
  broadcast join is the right plan when |queries| << |corpus|.
- ivf_assign / ivf_topk: IVF-style coarse quantization — assign every
  vector to its nearest centroid (broadcast centroids), then restrict the
  search to the probe cluster(s). At 10^9 vectors this turns a full scan
  into a 1/K partition-pruned scan when the cluster id is a partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_bp: bool = True,
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row. Query side is
    broadcast; ranking ties broken by corpus id for determinism. Cosine is
    reported in basis points (rounded long) so downstream comparisons are
    exact."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    )
    c = corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("cid") != F.col("qid"))
        .withColumn("cos_bp", F.round(cosine(F.col("qvec"), F.col("cvec")) * 10000).cast("long"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos_bp"), "cid")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("cid").alias("neighbor_id"), "cos_bp", "rank")
    )


def _centroid_array(centroids: DataFrame, centroid_id_col: str, vec_col: str) -> DataFrame:
    """Fold the (small, by IVF construction) centroid set into a single-row
    frame holding array<struct<c,v>> — broadcast-cross-joined onto the corpus
    so assignment is a pure map-side fold, no corpus shuffle at any K."""
    return F.broadcast(
        centroids.select(
            F.struct(
                F.col(centroid_id_col).cast("long").alias("c"), F.col(vec_col).alias("v")
            ).alias("s")
        ).agg(F.collect_list("s").alias("_cents"))
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid, shuffle-free: the
    centroid set rides along as one broadcast array column and the argmax is
    an in-row ``aggregate`` fold — zero corpus shuffle (the old
    crossJoin+groupBy plan shuffled corpus×K rows). Ties break to the
    smallest centroid id. All corpus columns are retained (map-side op), so
    downstream cluster-pruned search needs no join-back for the vector."""
    scored = corpus.crossJoin(_centroid_array(centroids, centroid_id_col, vec_col))
    bp = lambda c: F.round(  # noqa: E731 — cosine in basis points vs one centroid
        _dot(F.col(vec_col), c["v"]) / (F.col("_nrm") * _norm(c["v"])) * 10000
    ).cast("long")
    # array_max over struct(bp, -cid) is lexicographic: max bp, then min cid
    best = F.array_max(
        F.transform(F.col("_cents"), lambda c: F.struct(bp(c).alias("bp"), (-c["c"]).alias("ncid")))
    )
    keep = [n for n in corpus.columns]
    return (
        scored.withColumn("_nrm", _norm(F.col(vec_col)))
        .withColumn("_best", best)
        .select(
            *keep,
            (-F.col("_best")["ncid"]).alias(centroid_id_col),
            F.col("_best")["bp"].alias("centroid_cos_bp"),
        )
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold_bp: int = 9500,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold in basis points). With ``block_col`` (an IVF cluster id /
    label), the self-join is an equi-join within blocks — the pair space is
    sum of squared block sizes, not n^2; unblocked, assign clusters first
    (ivf_assign) and block on the assignment."""
    cols = [F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")]
    if block_col:
        cols.append(F.col(block_col).alias("_blk"))
    a = df.select(*cols)
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        *([F.col(block_col).alias("_blk")] if block_col else []),
    )
    joined = a.join(b, on="_blk") if block_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_bp", F.round(cosine(F.col("_va"), F.col("_vb")) * 10000).cast("long"))
        .filter(F.col("cos_bp") >= threshold_bp)
        .select("id_a", "id_b", "cos_bp")
    )


def ivf_assign_probes(
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    nprobe: int = 2,
) -> DataFrame:
    """Multi-probe assignment for the QUERY side of IVF search: each query
    row fans out to its ``nprobe`` nearest centroids (one output row per
    probe, ``probe_rank`` 1-based). Same shuffle-free shape as
    ``ivf_assign`` — broadcast centroid array, in-row sort, slice, explode.
    The fan-out multiplies only the (small) query side; the corpus is never
    reshaped, so the downstream equi-join stays partition-pruned per probe."""
    scored = queries.crossJoin(_centroid_array(centroids, centroid_id_col, vec_col))
    bp = lambda c: F.round(  # noqa: E731
        _dot(F.col(vec_col), c["v"]) / (F.col("_nrm") * _norm(c["v"])) * 10000
    ).cast("long")
    ranked = F.slice(
        F.reverse(
            F.array_sort(
                F.transform(
                    F.col("_cents"),
                    lambda c: F.struct(bp(c).alias("bp"), (-c["c"]).alias("ncid")),
                )
            )
        ),
        1,
        nprobe,
    )
    keep = [n for n in queries.columns]
    return (
        scored.withColumn("_nrm", _norm(F.col(vec_col)))
        .select(*keep, F.posexplode(ranked).alias("_pos", "_p"))
        .select(
            *keep,
            (-F.col("_p")["ncid"]).alias(centroid_id_col),
            F.col("_p")["bp"].alias("centroid_cos_bp"),
            (F.col("_pos") + 1).alias("probe_rank"),
        )
    )


def ivf_topk(
    corpus_assigned: DataFrame,
    queries_assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    k: int = 5,
) -> DataFrame:
    """Search only within the query's probe cluster(s): equi-join on
    centroid_id replaces the cross join — the scale path. Pass the query
    side through ``ivf_assign`` for 1-probe or ``ivf_assign_probes`` for
    multi-probe (higher recall; each corpus row lives in exactly one
    cluster, so probes never produce duplicate (qid, cid) pairs)."""
    q = queries_assigned.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"), centroid_id_col
    )
    c = corpus_assigned.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"), centroid_id_col
    )
    scored = (
        c.join(F.broadcast(q), on=centroid_id_col)
        .filter(F.col("cid") != F.col("qid"))
        .withColumn("cos_bp", F.round(cosine(F.col("qvec"), F.col("cvec")) * 10000).cast("long"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos_bp"), "cid")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("cid").alias("neighbor_id"), "cos_bp", "rank")
    )


def sq8_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "qvec",
    keep: list[str] | None = None,
) -> DataFrame:
    """INT8 scalar quantization (the FAISS SQ8 / Lucene int8-HNSW storage
    trick): L2-normalize, then round each component onto the [-127, 127]
    integer grid — 4x smaller than float32, and the ANN distance becomes an
    exact INTEGER dot product (SIMD-friendly, no float drift across engines
    or partitionings). Map-side only: no shuffle, no Python. The expression
    is spelled ``round(x * 127.0 / norm)`` so an oracle engine evaluating
    the same literal shape is bit-identical (same IEEE op order)."""
    nrm = _norm(F.col(vec_col))
    q = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * F.lit(127.0) / nrm).cast("int")
    )
    return df.select(F.col(id_col), *(keep or []), q.alias(out_col))


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Approximate cosine top-k over SQ8-quantized vectors: both sides are
    quantized once (map-side), the query side is broadcast, and ranking is
    by the exact integer dot product of the int8 codes (= cosine * 127^2 up
    to quantization error, monotone enough for recall@k). At 10^9 vectors
    this is the memory-bound scan variant: 4x fewer bytes per row than
    float32 brute force, integer multiply-add instead of FMA, and the score
    is engine-exact (no float tie instability). Ties break on corpus id."""
    qq = F.broadcast(
        sq8_quantize(queries, id_col, vec_col).select(
            F.col(id_col).alias("qid"), F.col("qvec").alias("_qa")
        )
    )
    cq = sq8_quantize(corpus, id_col, vec_col).select(
        F.col(id_col).alias("cid"), F.col("qvec").alias("_qb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("_qa"), F.col("_qb"), lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    w = W.partitionBy("qid").orderBy(F.desc("dot_q"), "cid")
    return (
        cq.crossJoin(qq)
        .filter(F.col("cid") != F.col("qid"))
        .withColumn("dot_q", dot)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("cid").alias("neighbor_id"), "dot_q", "rank")
    )
