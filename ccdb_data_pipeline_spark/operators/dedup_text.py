"""Document deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the training-data-pipeline extensions of the reference's
key-dedup archive merge (/root/reference/common/s3_utils.py:29-52), applied
to *content* instead of primary keys.

Scale design notes (the point of each choice at 10^8+ docs):
- shingling/explode happens AFTER whitespace normalization and distinct()
  per doc, so the shingle shuffle carries no duplicate weight;
- MinHash signatures are computed with a single groupBy (map-side partial
  min per hash function — no window, no skew pile-up);
- LSH banding turns the O(n^2) pair space into an equi-join on band keys
  (shuffle hash join on a uniformly-hashed key);
- candidate verification joins shingle sets ONLY for candidate pairs
  (semi-join pruning), never all-pairs;
- `hash_mode="md5"` exists for cross-engine oracle parity; the default
  `xxhash64` path is JVM-integer-only (faster, no strings in the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..functions.normalize import normalize_ws_sql

# persisted shingle frames awaiting release: MEMORY_AND_DISK blocks that
# spilled to disk are NOT evicted by LRU and would otherwise live for the
# app lifetime in a long-running session. Callers release them with
# release_caches() once the returned plan has been consumed.
_ACTIVE_CACHES: list[DataFrame] = []


def release_caches() -> None:
    """Unpersist shingle frames cached by minhash_lsh_dedup /
    ngram_jaccard_pairs since the last call. Invoke after collecting or
    writing the plans those functions returned."""
    while _ACTIVE_CACHES:
        _ACTIVE_CACHES.pop().unpersist()


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle).

    Shingling happens ARRAY-SIDE (transform over the token array) so the
    whole operator is a single narrow projection + explode: no per-doc
    window sort and no (id, shingle) distinct shuffle — dedup within a doc
    is array_distinct before the explode. At 10^8 docs this stage is
    shuffle-free; the first shuffle in any consumer is its own groupBy."""
    arr = F.split(normalize_ws_sql(F.col(text_col)), " ")
    shingles = F.when(
        F.size(arr) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(arr, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.explode(F.array_distinct(shingles)).alias("shingle")
    )


def minhash_signatures(
    shingle_df: DataFrame, id_col: str, n_hashes: int = 8, hash_mode: str = "xxhash64"
) -> DataFrame:
    """One row per doc with minhash_0..minhash_{n-1}. The min-aggregation is
    partial-aggregating (combiner on the map side)."""
    if hash_mode == "md5":
        hs = [
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh_{i}")
            for i in range(n_hashes)
        ]
    else:
        hs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh_{i}")
            for i in range(n_hashes)
        ]
    return shingle_df.groupBy(id_col).agg(*hs)


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str, n_hashes: int = 8, band_size: int = 2) -> DataFrame:
    """Band the signature and equi-join on (band, key): docs sharing any band
    become candidate pairs (id_a < id_b)."""
    n_bands = n_hashes // band_size
    bands = None
    for b in range(n_bands):
        cols = [F.col(f"mh_{b * band_size + j}").cast("string") for j in range(band_size)]
        part = sig_df.select(
            F.col(id_col), F.lit(b).alias("band"), F.concat_ws("#", *cols).alias("band_key")
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, on=["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    shingle_df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    threshold_bp: int = 2000,
) -> DataFrame:
    """Exact Jaccard for candidate pairs (basis points). Joins shingle sets
    only for candidates (two semi-joins prune the shingle table first)."""
    x = shingle_df.select(F.col(id_col).alias("id_a"), "shingle")
    y = shingle_df.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(x, "id_a").join(y, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    j = F.col("n_common") * 10000.0 / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("jaccard_bp", F.round(j).cast("long"))
        .filter(j >= threshold_bp)
        .select("id_a", "id_b", "jaccard_bp")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 8,
    band_size: int = 2,
    threshold_bp: int = 2000,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Full MinHash->LSH->verify pipeline: near-dup pairs with exact Jaccard.

    The shingle set feeds three consumers (signatures + both verify sides),
    so it is persisted for the life of the returned plan — one tokenize pass
    instead of three. Call release_caches() after consuming the result."""
    sh = word_shingles(df, id_col, text_col, n=n).persist()
    _ACTIVE_CACHES.append(sh)
    sig = minhash_signatures(sh, id_col, n_hashes=n_hashes, hash_mode=hash_mode)
    cand = lsh_candidate_pairs(sig, id_col, n_hashes=n_hashes, band_size=band_size)
    return jaccard_verify(sh, cand, id_col, threshold_bp=threshold_bp)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    n: int = 3,
    threshold_bp: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard within blocking groups (e.g. same lang+source):
    the non-approximate baseline. All-pairs only WITHIN a block — blocking
    keeps the pair space linear-ish; for unblocked scale use minhash_lsh.
    Call release_caches() after consuming the result."""
    sh = word_shingles(df, id_col, text_col, n=n).persist()
    _ACTIVE_CACHES.append(sh)
    blocks = df.select(id_col, *block_cols)
    a = blocks.select(F.col(id_col).alias("id_a"), *block_cols)
    b = blocks.select(F.col(id_col).alias("id_b"), *block_cols)
    pairs = a.join(b, on=block_cols).filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    return jaccard_verify(sh, pairs, id_col, threshold_bp=threshold_bp)


# ----------------------------------------------------------------- SimHash

# bit masks as literals (bit 63 = two's-complement min-long; summing each
# distinct mask at most once reconstructs the signed 64-bit hash exactly)
_SIMHASH_MASKS = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def _token_vote_array(key, hash_mode: str):
    """64-element ±1 vote array for one token's hash. For ``xxhash64`` the
    key is the 64-bit hash itself; for ``md5`` (oracle-parity mode) the key
    is the 32-char hex digest and bit b is bit (b mod 4) of hex nibble
    (b div 4) — a definition DuckDB can reproduce with substr+strpos."""
    if hash_mode == "md5":
        exprs = []
        for b in range(64):
            val = F.conv(key.substr(b // 4 + 1, 1), 16, 10).cast("int")
            exprs.append(
                F.when(val.bitwiseAND(F.lit(1 << (b % 4))) != 0, F.lit(1)).otherwise(F.lit(-1))
            )
        return F.array(*exprs)
    return F.array(
        *[
            F.when(key.bitwiseAND(F.lit(m)) != 0, F.lit(1)).otherwise(F.lit(-1))
            for m in _SIMHASH_MASKS
        ]
    )


def simhash64(df: DataFrame, id_col: str, text_col: str, hash_mode: str = "xxhash64") -> DataFrame:
    """64-bit SimHash per doc from word-token hashes — pure JVM expressions
    (no UDF) computed ARRAY-SIDE: per token a 64-element ±1 vote vector,
    folded per doc with element-wise zip_with sums, then the majority bits
    are reassembled into the signed 64-bit signature.

    One row per doc end-to-end — no explode at all (the earlier explode
    formulation emitted 64 rows per token, a 64x shuffle amplification on
    long docs). Everything here is a narrow per-row projection: the operator
    is shuffle-free regardless of doc length. Returns (id, simhash)."""
    toks = F.split(normalize_ws_sql(F.col(text_col)), " ")
    keys = F.transform(toks, (lambda w: F.md5(w)) if hash_mode == "md5" else (lambda w: F.xxhash64(w)))
    votes = F.aggregate(
        keys,
        F.array_repeat(F.lit(0), 64),
        lambda acc, k: F.zip_with(acc, _token_vote_array(k, hash_mode), lambda a, v: a + v),
    )
    mask_arr = F.array(*[F.lit(m).cast("long") for m in _SIMHASH_MASKS])
    contrib = F.zip_with(votes, mask_arr, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long")))
    sim = F.aggregate(contrib, F.lit(0).cast("long"), lambda a, x: a + x)
    return df.select(F.col(id_col), sim.alias("simhash"))


def simhash64_explode(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Reference formulation of simhash64 via explode + conditional sum —
    kept only as the parity baseline for tests (64 rows per token through
    the shuffle; superseded by the array-side simhash64 above)."""
    mask_arr = F.array(*[F.lit(m).cast("long") for m in _SIMHASH_MASKS])
    toks = df.select(
        F.col(id_col), F.explode(F.split(normalize_ws_sql(F.col(text_col)), " ")).alias("w")
    ).withColumn("h", F.xxhash64("w"))
    bits = toks.select(
        id_col, "h", F.posexplode(mask_arr).alias("bit", "mask")
    ).withColumn(
        "vote", F.when(F.col("h").bitwiseAND(F.col("mask")) != 0, 1).otherwise(-1)
    )
    agg = bits.groupBy(id_col, "bit", "mask").agg(F.sum("vote").alias("v"))
    return agg.groupBy(id_col).agg(
        F.sum(F.when(F.col("v") > 0, F.col("mask")).otherwise(0)).alias("simhash")
    )


def simhash_near_pairs(sim_df: DataFrame, id_col: str, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by Hamming distance <= max_hamming, using 16-bit-chunk
    banding (a pair within distance d<=3*16/16 shares at least one of 4
    chunks by pigeonhole when d<4; for larger d this is a recall-tuned
    heuristic, standard practice)."""
    chunks = None
    for c in range(4):
        part = sim_df.select(
            F.col(id_col),
            F.col("simhash"),
            F.lit(c).alias("chunk"),
            F.shiftright(F.col("simhash"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk_key"),
        )
        chunks = part if chunks is None else chunks.unionByName(part)
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "chunk_key")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "chunk_key")
    cand = (
        a.join(b, on=["chunk", "chunk_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def duplicate_span_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Per-document exact duplicate-SPAN statistics — the memorization
    signal document-level dedup misses (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": cross-document repeated
    substrings). A span is a word n-gram; a span is SHARED when it occurs
    in >= 2 distinct documents. Emits per doc: distinct-span count,
    shared-span count, shared fraction in basis points.

    Plan shape: shingle array-side (word_shingles — per-doc dedup happens
    BEFORE the explode), then key every shuffle on ``xxhash64(shingle)``
    so exchanges carry 8-byte keys instead of raw n-gram strings; count
    docs per span; join back on the SAME hashed key (the exchange
    partitioning is reused); one final groupBy(doc). Two logical shuffles
    total — the suffix-array-free approximation that actually distributes
    at 10^10 spans."""
    sh = word_shingles(df, id_col, text_col, n=n).select(
        id_col, F.xxhash64("shingle").alias("_g")
    )
    per_g = sh.groupBy("_g").agg(F.count(F.lit(1)).alias("_nd"))
    return (
        sh.join(per_g, "_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.count_if(F.col("_nd") >= 2).cast("long").alias("n_shared"),
        )
        .withColumn(
            "shared_bp",
            F.round(10000.0 * F.col("n_shared") / F.col("n_spans")).cast("long"),
        )
    )


def scrub_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 5, min_docs: int = 2
) -> DataFrame:
    """Exact substring-dedup TRANSFORM (the removal step behind
    ``duplicate_span_stats``'s report — Lee et al. 2022's cleaning pass,
    word-n-gram form): every word covered by an n-gram that occurs in
    >= ``min_docs`` distinct documents is cut, and the survivors are
    re-joined into cleaned text. Output per input doc (every doc, even
    fully-scrubbed ones): ``(id, n_words, n_removed, cleaned_text)``.

    Unlike the stats op, the grouping key here is the RAW n-gram string,
    not its xxhash64: this operator deletes training text, and a hash
    collision would silently delete innocent spans. The strings are short
    (n words) and the count aggregate partial-aggregates map-side, so the
    exchange carries one (gram, count) pair per distinct gram — at
    10^10 spans still far cheaper than the explode that produced them.

    Plan: array-side tokenize once; positional grams explode (n-4 rows per
    doc, no distinct — positions matter); groupBy(gram) HAVING >= min_docs;
    semi-join marks duplicated gram STARTS; each start fans out to its n
    covered positions (array-side sequence, then distinct); left-anti join
    drops covered tokens; one final groupBy(doc) re-assembles survivors in
    position order. Three shuffles total (gram count, covered distinct,
    final groupBy) — each keyed and combinable.
    """
    from ..functions.normalize import normalize_ws_sql

    words = F.filter(
        F.split(normalize_ws_sql(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda w: w != "",
    )
    base = df.select(F.col(id_col).alias("_id"), words.alias("_ws"))

    gram_structs = F.when(
        F.size("_ws") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("_ws") - n),
            lambda i: F.struct(
                i.alias("pos"), F.concat_ws(" ", F.slice("_ws", i + 1, n)).alias("g")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,g:string>>"))
    grams = base.select("_id", F.explode(gram_structs).alias("s")).select(
        "_id", F.col("s.pos").alias("pos"), F.col("s.g").alias("g")
    )

    dup = (
        grams.groupBy("g")
        .agg(F.count_distinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("g")
    )
    covered = (
        grams.join(dup, "g")
        .select("_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("pos"))
        .distinct()
    )

    toks = base.select("_id", F.posexplode("_ws").alias("pos", "tok"))
    kept = toks.join(covered, ["_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("cleaned_text"),
    )

    return (
        base.select("_id", F.size("_ws").cast("long").alias("n_words"))
        .join(rebuilt, "_id", "left_outer")
        .select(
            F.col("_id").alias(id_col),
            "n_words",
            (F.col("n_words") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        )
    )
