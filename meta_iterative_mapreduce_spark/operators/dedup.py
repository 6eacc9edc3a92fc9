"""Deduplication operators for LLM data pipelines (SURVEY.md §2.2 L).

Four tiers, cheap→thorough, all shuffle-frugal:
- exact dedup: one hash aggregate on the text (or a normalized form);
- blocked exact n-gram Jaccard: cheap blocking key bounds the
  candidate pairs, then an explode+join computes exact set overlap —
  the "verify" stage of a production near-dup pipeline;
- MinHash + LSH banding: the scale path for all-pairs near-dup at
  100 TB — signature computation is embarrassingly parallel, and the
  only shuffle is the band-bucket groupBy (candidates only, never n²);
- SimHash: 32-bit bitwise fingerprint via token-hash bit votes.

MinHash/SimHash use Spark's xxhash64 (engine-specific, 64-bit — a
32-bit shingle hash has a measurable collision floor at tens of
millions of shingles), so no SQL oracle can recompute their raw
pair/estimate values. Every production query is still fully
hash-oracled (VERDICT r14 item 1): each lean pipeline returns a
flag-bearing summary whose doc counts DuckDB pins exactly and whose
structural flags (pair ordering, estimate range, band agreement,
hamming bound) are recomputed in-query from the pipeline's own
output — the q_dedup_simhash pattern. The heavyweight brute-force /
exact-recall arms stay in the `q_*_cert` certification twins so the
benched production plans remain the lean scale paths; the raw pair
surfaces remain exposed via the module-level helpers
(minhash_band_pairs, simhash_hamming_pairs, incremental_band_pairs)
and are property-tested in tests/test_dedup.py. The exact tiers are
DuckDB-oracle-checked directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register

# MinHash "permutations" = per-function seeded hashing: the j-th hash
# of a shingle is xxhash64(shingle_hash, j) — 32 fully independent
# 64-bit hash functions, no modular fold. The earlier LCG family
# h_i(x) = (a_i·x + b_i) mod p with a_i, b_i AFFINE IN i was subtly
# broken at scale: h_i(v) = (v + b + i·c(v)) mod p is an arithmetic
# progression in i, so a single cross-doc collision value v with a
# small stride c(v) agrees across MANY "independent" permutations at
# once — measured as unrelated 1M-doc pairs with 16/32 signature
# agreement. Seeded hashing has no shared structure across j.
_N_HASHES = 32
_N_BANDS = 8  # 8 bands × 4 rows


@register(
    "q_dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies, MIN(n_chars) AS n_chars
    FROM documents
    GROUP BY text
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content, keep the smallest doc_id. One
    hash aggregate — grouped on md5(text) (VERDICT r12 item 4), so the
    shuffle moves 16-byte keys instead of whole documents: at 100 TB
    the full-text group key would push the entire corpus through one
    exchange; md5 keys make the exchange O(n_docs × 16 B) regardless
    of document size (collision odds at 10¹² docs ≈ 10⁻¹³ — the same
    contract every content-addressed store relies on). The oracle
    groups by text directly: identical grouping, engine-independent
    result, so the hash gate also certifies the md5 grouping loses
    nothing on real data."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("__k")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("n_chars").alias("n_chars"),
    ).drop("__k")


@register(
    "q_dedup_exact_norm",
    oracle="""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY REGEXP_REPLACE(TRIM(LOWER(text)), ' +', ' ', 'g')
    """,
)
def q_dedup_exact_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized exact dedup: lowercase + trim + collapse whitespace
    before grouping (catches trivial near-dups exactly)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), " +", " ")
    return (
        d.groupBy(norm.alias("norm_text"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .drop("norm_text")
    )


# Document-frequency cutoff for the Jaccard token self-join: a token
# shared by >64 docs of the same (lang, length) block would alone emit
# up to 64² candidate rows per block key; beyond that it is a stopword
# for the block and carries negligible Jaccard signal. Bounds the
# per-key join fan-out at 100 TB (the hot-key bomb) while leaving the
# fixtures untouched (their max block-key df is 10 at sf0.1).
_JACCARD_DF_CUTOFF = 64


# Shared CTE text for the blocked-Jaccard pair set (ends with jpairs:
# doc_a, doc_b, j — j UNROUNDED: n_inter/(|a|+|b|-n_inter) is one IEEE
# division of exact integers, identical in both engines, so thresholds
# on the raw value are engine-safe while ROUND output hygiene stays in
# the leaf queries).
_JACCARD_PAIRS_CTE = f"""
    toks0 AS (
        SELECT doc_id, lang, LENGTH(text) AS tlen,
               unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents
    ), keydf AS (
        SELECT token, lang, tlen FROM toks0
        GROUP BY token, lang, tlen
        HAVING COUNT(*) <= {_JACCARD_DF_CUTOFF}
    ), toks AS (
        SELECT t.* FROM toks0 t
        JOIN keydf k ON t.token = k.token AND t.lang = k.lang
                    AND t.tlen = k.tlen
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM toks a JOIN toks b
          ON a.token = b.token AND a.lang = b.lang AND a.tlen = b.tlen
         AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), jpairs AS (
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_inter AS DOUBLE)
                   / (sa.n_tok + sb.n_tok - i.n_inter) AS j
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
    )
"""


@register(
    "q_dedup_ngram_jaccard",
    oracle=f"""
    WITH {_JACCARD_PAIRS_CTE}
    SELECT doc_a, doc_b, ROUND(j, 4) AS jaccard FROM jpairs
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact Jaccard: candidate pairs share a cheap blocking key
    (lang, char length); exact token-set overlap via explode + equi-join.
    The blocking key bounds the quadratic stage — the same role LSH
    buckets play at scale.

    Two deliberate scale/recall trade-offs, mirrored in the oracle:
    - tokens whose document frequency within a block key exceeds
      _JACCARD_DF_CUTOFF are dropped from the token universe (both
      intersection and sizes) before the self-join — a per-block
      stopword filter that caps the hot-key fan-out at cutoff² rows
      while barely moving the Jaccard of any real near-dup pair;
    - the exact-`tlen` blocking key means two near-dups differing by
      even one character are never compared. That is the declared
      "blocked exact" semantics (the verify stage of a pipeline whose
      candidate generation is MinHash/SimHash); use
      q_dedup_near_minhash for recall across length changes.
    """
    return jaccard_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


def jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jaccard) with the UNROUNDED jaccard double — the
    shared pair builder behind q_dedup_ngram_jaccard (which rounds for
    output hygiene) and q_dedup_components (which thresholds the raw
    value; one IEEE division of exact ints is engine-deterministic)."""
    d = load_table(spark, sf_dir, "documents")
    toks0 = d.select(
        "doc_id",
        "lang",
        F.length("text").alias("tlen"),
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    )
    # df cutoff: keep only block keys shared by <= cutoff docs. The key
    # table is ~|vocab| rows of 3 small columns — broadcastable at most
    # scales; Spark picks broadcast vs shuffle semi-join via AQE.
    keep_keys = (
        toks0.groupBy("token", "lang", "tlen")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _JACCARD_DF_CUTOFF)
        .drop("df")
    )
    # The filtered token table feeds FOUR consumers (sizes, both
    # self-join sides — and toks0 additionally feeds keep_keys): without
    # a persist Catalyst re-runs the corpus explode per consumer.
    # Persisting trades memory ~O(corpus tokens) for a single explode
    # pass — the same call the minhash signature build makes; at 100 TB
    # MEMORY_AND_DISK spills gracefully and is still far cheaper than
    # 4 corpus re-scans.
    toks = toks0.join(keep_keys, ["token", "lang", "tlen"], "left_semi").persist()
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.tlen") == F.col("b.tlen"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("sa.n_tok") + F.col("sb.n_tok") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def word_shingles(text_col: str, width: int = 3) -> F.Column:
    """Array of space-joined word `width`-shingles of `text_col`
    (docs under `width` words contribute the whole text as their one
    shingle). Built by folding zip_with over SHIFTED SLICES of the
    token array, never by indexing inside a transform lambda: a
    lambda body like array_join(slice(split(text), i+1, w)) re-runs
    the split() per OUTPUT ELEMENT (Catalyst inlines the expression
    into the lambda, making shingling O(len²) per doc — measured
    3.2 s → 0.6 s at sf0.1 for the shingle explode alone, guide §1.2
    step 2). Here every slice is an argument-level expression,
    evaluated once per row; the zip_with null-padded tail is filtered
    off. Output strings are byte-identical to the old form."""
    w = F.split(text_col, " ")
    n = F.size(w)
    acc: F.Column = w
    for k in range(1, width):
        acc = F.zip_with(
            w if k == 1 else acc,
            F.slice(w, k + 1, F.greatest(n - k, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(
        n >= width, F.filter(acc, lambda x: x.isNotNull())
    ).otherwise(F.array(F.col(text_col)))


def minhash_signatures(d: DataFrame, shingle_width: int = 3) -> DataFrame:
    """(doc_id, sig: array<bigint>) — MinHash over word shingles.

    Shingle hash = xxhash64 of the joined shingle text; the j-th
    permutation value is xxhash64(shingle_hash, j) — independent
    seeded 64-bit hash functions (see the module-level note on why the
    affine LCG family and 32-bit shingle hashes both break at the
    tens-of-millions-of-shingles scale: correlated permutations and a
    birthday collision floor, each measured in the 1M-doc smoke).

    Shape matters: shingle hashes are exploded to (doc_id, h) rows and
    the 32 permutation minima are computed as 32 MIN aggregates in ONE
    hash-aggregate pass (map-side partial agg ⇒ the shuffle carries
    ~one row per doc per partition). The naive all-array form
    re-evaluates the shingle subtree once per permutation — 32× the
    work — because Catalyst's project collapse inlines it. A per-row
    zip_with(least) FOLD over the shingle-hash array (the
    simhash_votes move) was tried in optimization r15 and measured
    WORSE (near_minhash 2.6 → 3.0 s, incremental 2.2 → 5.8 s at
    sf0.1): nested higher-order lambdas evaluate interpreted with two
    array allocations per shingle, while the 32 MIN aggregates ride
    whole-stage codegen — simhash won from that move only because its
    cost was the 60-aggregate ANALYSIS round, which minhash's 32
    cheaper aggregates never paid.
    """
    hashed = d.select(
        "doc_id",
        F.explode(word_shingles("text", shingle_width)).alias("s"),
    ).select("doc_id", F.xxhash64("s").alias("h"))
    mins = [
        F.min(F.xxhash64(F.col("h"), F.lit(j))).alias(f"m{j}")
        for j in range(_N_HASHES)
    ]
    per_doc = hashed.groupBy("doc_id").agg(*mins)
    return per_doc.select(
        "doc_id", F.array(*[f"m{j}" for j in range(_N_HASHES)]).alias("sig")
    )


_MINHASH_RECALL_J = 0.8  # exact shingle-Jaccard threshold the LSH
# bands must catch: P(candidate | J) = 1-(1-J^4)^8 = 0.993 at J=0.8,
# and the signatures are deterministic (seeded xxhash64), so recall on
# a given fixture is a fixed fact, not a sample — verified 0 misses at
# sf0.001/0.01/0.1

# Exact word-3-shingle Jaccard pairs, df-bounded — the SAME similarity
# the minhash signatures estimate (distinct 3-word shingles; docs
# under 3 words contribute the whole text as their one shingle,
# mirroring minhash_signatures). Shingles with document frequency
# above the cutoff are dropped from sizes AND intersections before the
# self-join, capping any join key's fan-out at cutoff² (the same
# blocking discipline as _JACCARD_PAIRS_CTE).
_SHINGLE_JACCARD_CTE = f"""
    swords AS (
        SELECT doc_id, string_split(text, ' ') AS w, text FROM documents
    ), sh0 AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(w) >= 3 THEN
                list_transform(range(1, len(w) - 1),
                               i -> array_to_string(w[i:i+2], ' '))
            ELSE [text] END)) AS sh
        FROM swords
    ), shkeep AS (
        SELECT sh FROM sh0 GROUP BY sh
        HAVING COUNT(*) <= {_JACCARD_DF_CUTOFF}
    ), shtoks AS (
        SELECT t.doc_id, t.sh FROM sh0 t JOIN shkeep k ON t.sh = k.sh
    ), shsizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM shtoks GROUP BY doc_id
    ), shinter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM shtoks a JOIN shtoks b
          ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), shpairs AS (
        SELECT i.doc_a, i.doc_b,
               CAST(i.n_inter AS DOUBLE)
                   / (sa.n_sh + sb.n_sh - i.n_inter) AS j
        FROM shinter i
        JOIN shsizes sa ON sa.doc_id = i.doc_a
        JOIN shsizes sb ON sb.doc_id = i.doc_b
    )
"""


def shingle_jaccard_pairs(
    spark: SparkSession, sf_dir: str, caches: list | None = None
) -> DataFrame:
    """(doc_a, doc_b, jaccard) under EXACT word-3-shingle Jaccard with
    the df cutoff — the ground-truth tier the minhash containment
    certification compares against (must mirror _SHINGLE_JACCARD_CTE
    and minhash_signatures' shingle definition exactly). The filtered
    shingle table is persisted (it feeds sizes + both self-join
    sides); pass `caches` to receive the persisted DataFrame so the
    caller can release it once the result is materialized (the cert
    twin's try/finally) — without it the caller owns cache release."""
    d = load_table(spark, sf_dir, "documents")
    ex = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles("text", 3))).alias("sh"),
    )
    keep = (
        ex.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _JACCARD_DF_CUTOFF)
        .drop("df")
    )
    # persisted: feeds sizes + both self-join sides (same rationale as
    # jaccard_pairs)
    t = ex.join(keep, "sh", "left_semi").persist()
    if caches is not None:
        caches.append(t)
    sizes = t.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = t.alias("a")
    b = t.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "n_sh", "na"
    )
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "n_sh", "nb"
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


# Band floor for the agreement estimate: an LSH candidate pair agrees
# on at least one FULL band of _N_HASHES/_N_BANDS consecutive signature
# positions, so jaccard_est >= rows_per_band / n_hashes — an exact
# binary fraction, engine-safe to threshold on.
_BAND_EST_FLOOR = (_N_HASHES // _N_BANDS) / float(_N_HASHES)


def _violations(cond: F.Column) -> F.Column:
    """Aggregate counting rows where `cond` is false OR NULL — the
    summary queries' flag primitive: `_violations(c) == 0` is
    bool_and(c) with vacuous truth on empty inputs (coalesce 0), but
    SUM keeps the aggregate HASH-based with map-side partials where
    bool_and over array-carrying rows planned a Sort + SortAggregate.
    Shape matters: when(cond, 0).otherwise(1) — NOT when(~cond, 1)
    .otherwise(0), whose NULL condition falls into otherwise(0) and
    silently counts a NULL (e.g. a corrupted sig array making
    jaccard_est NULL) as satisfied."""
    return F.coalesce(F.sum(F.when(cond, 0).otherwise(1)), F.lit(0))


def near_minhash_summary(sigs: DataFrame) -> DataFrame:
    """LAZY 1-row flag summary over the LSH candidate pairs of a
    (persisted) signature table — the plan q_dedup_near_minhash
    checkpoints; see its docstring for the flag semantics. deduped=
    False: the universally-quantified flags are multiplicity-
    insensitive, so the pair dedup's Exchange + sort-based first()
    aggregate would be pure overhead."""
    pairs = minhash_band_pairs(sigs, with_sigs=True, deduped=False)
    rpb = _N_HASHES // _N_BANDS
    shares_band: F.Column = F.lit(False)
    for b in range(_N_BANDS):
        shares_band = shares_band | (
            F.slice("sig_a", b * rpb + 1, rpb)
            == F.slice("sig_b", b * rpb + 1, rpb)
        )
    flags = pairs.agg(
        (_violations(F.col("doc_a") < F.col("doc_b")) == 0).alias(
            "pairs_ordered"
        ),
        (
            _violations(
                (F.col("jaccard_est") >= F.lit(_BAND_EST_FLOOR))
                & (F.col("jaccard_est") <= F.lit(1.0))
            )
            == 0
        ).alias("est_in_band_range"),
        (_violations(shares_band) == 0).alias("band_agreement"),
    )
    # minhash_signatures emits exactly one row per document (every doc
    # has >= 1 shingle), so the corpus count rides the already
    # persisted signature table instead of a second parquet scan.
    head = sigs.agg(F.count(F.lit(1)).alias("n_docs"))
    return head.crossJoin(flags)


@register(
    "q_dedup_near_minhash",
    oracle="""
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           TRUE AS pairs_ordered,
           TRUE AS est_in_band_range,
           TRUE AS band_agreement
    """,
)
def q_dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup detection, the 100 TB path:
    shingle → 32 minhashes → 8 bands of 4 → band-bucket groupBy →
    candidate pairs → signature-agreement estimate of Jaccard. The
    only data-proportional shuffle is on (band_id, band_signature);
    the quadratic pair expansion happens strictly within buckets.

    Signature values are xxhash64-based, so no SQL oracle can
    recompute the raw pair rows — the query therefore returns a
    flag-bearing summary of the FULL candidate pair set (VERDICT r14
    item 1, the q_dedup_simhash pattern), all pipeline work still
    benched, with structural invariants recomputed from the pairs
    themselves:

    - pairs_ordered: every candidate satisfies doc_a < doc_b (the
      bucket self-join's ordering predicate held);
    - est_in_band_range: every jaccard_est ∈ [4/32, 1] — the LOWER
      bound is the banding theorem (a candidate shares >= 1 full band
      of 4 positions), so a broken estimator OR a join emitting
      non-band pairs flips it;
    - band_agreement: re-derived per pair from the signature arrays
      (some band b has slice(sig_a) == slice(sig_b)) — pins the
      band_sig string encoding against collisions/mangling.

    DuckDB pins the exact corpus doc count and TRUE flags; empty pair
    sets certify vacuously (coalesce TRUE). The exact shingle-Jaccard
    recall arm lives in q_dedup_near_minhash_cert; the raw pair
    surface stays exposed via minhash_band_pairs for tests and the
    1M-doc recall smoke."""
    d = load_table(spark, sf_dir, "documents")
    # Materialize signatures once: without the persist, Catalyst's
    # project-collapse inlines the 32-permutation shingle subtree into
    # every downstream reference AND recomputes it for both sides of
    # the self-join (O(64×) work). The signature table is tiny
    # (n_docs × 32 bigints), so caching is the scale-correct plan too.
    # try/finally + eager 1-row localCheckpoint: the cache is released
    # before return (VERDICT r14 item 9 — the old lazy form leaked the
    # persisted signature table into long-lived sessions).
    sigs = minhash_signatures(d).persist()
    try:
        out = near_minhash_summary(sigs).localCheckpoint(eager=True)
    finally:
        sigs.unpersist()
    return out


@register(
    "q_dedup_near_minhash_cert",
    oracle=f"""
    WITH {_SHINGLE_JACCARD_CTE}
    SELECT doc_a, doc_b, ROUND(j, 4) AS jaccard,
           TRUE AS in_minhash_candidates
    FROM shpairs WHERE j >= {_MINHASH_RECALL_J}
    ORDER BY doc_a, doc_b
    """,
)
def q_dedup_near_minhash_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-recall certification twin of q_dedup_near_minhash
    (VERDICT r13 item 1: the certification arm is its own registered
    query so the production plan stays lean): DuckDB independently
    computes the EXACT word-3-shingle Jaccard tier
    (_SHINGLE_JACCARD_CTE — the very similarity the 32-perm
    signatures estimate, df-bounded the same way the oracled token
    tier is) at J ≥ 0.8, and this query returns that slice with a
    per-pair containment flag: every such pair must appear among the
    MinHash band candidates (exact-recall containment). A broken
    shingle pass, signature permutation, banding split, or bucket
    join drops a pair's flag and fails the hash.

    Margin note (ADVICE r13): 8×4 banding catches a J = 0.8 pair
    w.p. 1-(1-0.8^4)^8 ≈ 0.993 per pair; the seeded xxhash64
    signatures make the outcome DETERMINISTIC per fixture (0 misses
    measured at sf0.001/0.01/0.1), but the guarantee is per-fixture,
    not universal — REGENERATING the documents fixture (or adding
    docs) requires re-running this query at every SF before trusting
    the stamp; a miss here is an expected ~0.7%-per-pair event, not
    necessarily a code bug. The candidate-pair surface itself stays
    pinned by tests/test_dedup.py."""
    d = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(d).persist()
    caches: list = []
    try:
        cands = minhash_band_pairs(sigs).select("doc_a", "doc_b")
        high = shingle_jaccard_pairs(spark, sf_dir, caches).filter(
            F.col("jaccard") >= _MINHASH_RECALL_J
        )
        out = (
            high.join(
                cands.withColumn("__hit", F.lit(True)),
                ["doc_a", "doc_b"],
                "left",
            )
            .select(
                "doc_a",
                "doc_b",
                F.round("jaccard", 4).alias("jaccard"),
                F.coalesce("__hit", F.lit(False)).alias(
                    "in_minhash_candidates"
                ),
            )
            .orderBy("doc_a", "doc_b")
        )
        # materialize before unpersist: the returned DataFrame must not
        # depend on a cache this function already released
        out = out.localCheckpoint(eager=True)
    finally:
        sigs.unpersist()
        for c in caches:
            c.unpersist()
    return out


def band_rows(sigs: DataFrame) -> DataFrame:
    """(doc_id, sig, band_id, band_sig): each signature exploded into
    its 8 LSH band keys — the bucket table banding joins on, and the
    EXACT rows the incremental path persists to the versioned log (so
    a future batch joins against these instead of rescanning the
    corpus)."""
    rows_per_band = _N_HASHES // _N_BANDS
    return sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.array_join(
                        F.transform(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                        "_",
                    )
                    for b in range(_N_BANDS)
                ]
            )
        ).alias("band_id", "band_sig"),
    )


def minhash_band_pairs(
    sigs: DataFrame, with_sigs: bool = False, deduped: bool = True
) -> DataFrame:
    """LSH banding over a persisted (doc_id, sig) table: 8 bands of 4
    rows -> band-bucket self-join -> per-pair signature-agreement
    Jaccard estimate. The ONLY data-proportional exchange is on
    (band_id, band_sig); quadratic expansion happens strictly within
    buckets. Reused by q_dedup_near_minhash and the 1M-doc recall
    smoke (tools/scale_smoke.py). `with_sigs=True` additionally keeps
    the sig_a/sig_b arrays so the caller can re-verify band agreement
    per pair (the production summary's band_agreement flag).
    `deduped=False` skips the (doc_a, doc_b) dropDuplicates — a pair
    agreeing on k bands then appears k times; correct for consumers
    whose aggregates are multiplicity-insensitive (the production
    summary's universally-quantified flags), and it removes a whole
    Exchange + SortAggregate (first() over the sig arrays is not
    hash-aggregable, so the dedup plans sort-based)."""
    banded = band_rows(sigs)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
    )
    if deduped:
        pairs = pairs.dropDuplicates(["doc_a", "doc_b"])
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    ).cast("double") / F.lit(float(_N_HASHES))
    cols = ["doc_a", "doc_b", *(["sig_a", "sig_b"] if with_sigs else [])]
    return pairs.select(*cols, est.alias("jaccard_est"))


# 60-bit fingerprint: wide enough that 15-bit pigeonhole blocks give
# 32768 bucket values each (a 32-bit/8-bit-block scheme has only 256 —
# at millions of docs every bucket holds thousands of fingerprints and
# the "blocked" join degenerates toward all-pairs). 60 = 4×15 keeps
# every value positive in a bigint (no sign-bit hazards in shiftright/
# %/bit_count).
_SIMHASH_BITS = 60
_SIMHASH_MAX_HAMMING = 3
_SIMHASH_N_BLOCKS = 4
_SIMHASH_BLOCK_BITS = _SIMHASH_BITS // _SIMHASH_N_BLOCKS  # 15
_SIMHASH_MASK = (1 << _SIMHASH_BITS) - 1


def _simhash_powers() -> F.Column:
    """bit-value literals 2^0..2^59, shared by the vote and fingerprint
    folds (bitwiseAND against these replaces shiftright, whose PySpark
    form only takes a Python-int shift count, not a lambda variable).
    A function, not a module constant: building Columns needs an active
    SparkContext, which import time doesn't have."""
    return F.array(*[F.lit(1 << bit) for bit in range(_SIMHASH_BITS)])


def simhash_votes(docs: DataFrame) -> DataFrame:
    """(doc_id, votes: array<int>[60]) per-bit vote sums over each
    doc's DISTINCT token set.

    Shape (optimization r15, VERDICT r14 item 3): votes are a SINGLE
    array-typed column computed per row — fold the doc's token-hash
    array with a zip_with accumulator (each hash contributes ±1 per
    bit) — instead of exploding to (doc_id, h) rows and re-collecting
    with 60 named SUM aggregates. The vote sums are per-doc pure
    functions, so the explode + groupBy exchange bought nothing, and
    the 60-aggregate form cost a full Catalyst analysis/codegen round
    per arm (two arms in q_dedup_simhash ≈ half the query's wall
    clock). Integer addition is commutative, so the folded sums are
    bit-identical to the aggregate form's. The token-hash array is an
    ARGUMENT of the fold (evaluated once per row), never referenced
    inside a lambda body — the word_shingles O(len²) inlining lesson."""
    hs = F.transform(
        F.array_distinct(F.split("text", " ")),
        lambda t: F.xxhash64(t).bitwiseAND(F.lit(_SIMHASH_MASK)),
    )
    zeros = F.array_repeat(F.lit(0), _SIMHASH_BITS)
    votes = F.aggregate(
        hs,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                _simhash_powers(),
                lambda p: F.when(h.bitwiseAND(p) != 0, F.lit(1)).otherwise(
                    F.lit(-1)
                ),
            ),
            lambda a, x: a + x,
        ),
    )
    return docs.select("doc_id", votes.alias("votes"))


def _fingerprint_expr(votes_col: str = "votes") -> F.Column:
    """60-bit fingerprint from the votes array: bit b contributes 2^b
    iff its vote sum is positive — one zip_with against the power
    literals plus a flat sum fold (constant expression depth; the
    named-column chained-Add form cost a 60-deep analysis tree)."""
    bits = F.zip_with(
        F.col(votes_col),
        _simhash_powers(),
        lambda v, p: F.when(v > 0, p).otherwise(F.lit(0)),
    )
    return F.aggregate(
        bits, F.lit(0).cast("bigint"), lambda acc, x: acc + x
    ).cast("bigint")


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """SimHash: (doc_id, simhash) 60-bit fingerprint from per-token
    hash bit votes (xxhash64 masked to 60 bits so all arithmetic stays
    in positive bigint range). Docs whose fingerprints agree on most
    bits are near-dups; q_dedup_simhash_pairs blocks them for the
    join. One narrow per-row expression — no explode, no exchange."""
    return simhash_votes(docs).select(
        "doc_id", _fingerprint_expr().alias("simhash")
    )


_SIMHASH_MUT_DOC_BUDGET = 2000  # certification sample row budget for
# q_dedup_simhash's clone/mutation slice (VERDICT r13 item 2: derive
# sample moduli from budgets, not constants — the mutation arm is
# LINEAR in the sample, so the budget is a doc count, and the modulus
# max(1, ceil(n/budget)) keeps the arm bounded at any fixture scale)


@register(
    "q_dedup_simhash",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS c FROM documents),
         m AS (SELECT GREATEST(1, CAST(CEIL(
                   c / {_SIMHASH_MUT_DOC_BUDGET}.0) AS BIGINT)) AS md
               FROM n)
    SELECT n.c AS n_docs,
           (SELECT COUNT(*) FROM documents, m
            WHERE doc_id % m.md = 0) AS n_sample_docs,
           TRUE AS fingerprints_in_range,
           TRUE AS clone_fp_identical,
           TRUE AS mutation_within_margin
    FROM n
    """,
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprinting, certified by an in-query synthetic
    mutation slice (VERDICT r13 item 4 — the last rows-only query,
    now flag-oracled; the raw (doc_id, simhash) surface stays exposed
    via simhash_fingerprints and is consumed by q_dedup_simhash_pairs
    and pytest).

    Fingerprint values are xxhash64-based, so no SQL oracle can
    recompute them — but two exact THEOREMS about the pipeline are
    checkable on a deterministic budget-bounded doc sample:

    - clone_fp_identical: appending a DUPLICATE of a doc's first
      token must leave the fingerprint bit-identical (votes are over
      the distinct token set — array_distinct semantics pinned);
    - mutation_within_margin: replacing one distinct token with a
      fresh token changes each bit's vote sum by at most 2 (remove
      ±1, add ±1), so only bits whose original |vote| ≤ 2 can flip —
      hamming(fp, fp_mutant) ≤ #{bits: |v| ≤ 2}, computed per doc
      from the original vote sums. Deterministic for ANY fixture (no
      probabilistic margin), unlike a raw hamming-distance pin.

    DuckDB pins the exact corpus/sample doc counts (sample modulus
    derived from the same doc budget formula) and TRUE flags; a
    broken tokenizer, bit-vote aggregate, or fingerprint fold flips
    a flag and fails the hash. fingerprint ∈ [0, 2^60) is checked
    corpus-wide."""
    import math

    d = load_table(spark, sf_dir, "documents")
    votes = simhash_votes(d).persist()
    try:
        fp = votes.select("doc_id", _fingerprint_expr().alias("simhash"))
        # one job: corpus size (drives the sample modulus) + the
        # corpus-wide range flag from the same cached votes
        head = fp.agg(
            F.count(F.lit(1)).alias("n"),
            F.bool_and(
                (F.col("simhash") >= 0)
                & (F.col("simhash") < F.lit(1 << _SIMHASH_BITS))
            ).alias("ok"),
        ).collect()[0]
        n_docs, in_range = int(head["n"]), head["ok"]
        mod = max(1, math.ceil(n_docs / _SIMHASH_MUT_DOC_BUDGET))

        toks = F.array_distinct(F.split("text", " "))
        sample = d.filter(F.col("doc_id") % mod == 0)
        newtok = F.concat(F.lit("zzmut"), F.col("doc_id").cast("string"))
        # Both variants are rebuilt by joining token ARRAYS (tokens
        # cannot contain the separator — they came from split), so the
        # round-tripped distinct set is exact even for docs holding
        # empty-string tokens (concat_ws would mangle those).
        # clone: duplicate the first distinct token => same distinct
        # token set => identical fingerprint
        clone = sample.select(
            "doc_id",
            F.array_join(F.concat(toks, F.slice(toks, 1, 1)), " ").alias(
                "text"
            ),
        )
        # mutant: drop the first distinct token, add a fresh one the
        # corpus cannot contain => per-bit vote delta in {-2, 0, +2}
        mutant = sample.select(
            "doc_id",
            F.array_join(
                F.concat(F.slice(toks, 2, F.size(toks)), F.array(newtok)),
                " ",
            ).alias("text"),
        )
        # bits whose original |vote| <= 2 are the only ones a one-token
        # substitution can flip — count them straight off the votes array
        margin = F.size(
            F.filter(F.col("votes"), lambda v: F.abs(v) <= 2)
        )
        # ONE variant fingerprint pipeline for clone + mutant (doc_id
        # is tagged even/odd) — two separate simhash_votes plans cost
        # a second analysis/codegen round for no data win
        variants = clone.select(
            (F.col("doc_id") * 2).alias("doc_id"), "text"
        ).unionByName(
            mutant.select(
                (F.col("doc_id") * 2 + 1).alias("doc_id"), "text"
            )
        )
        vfp = simhash_fingerprints(variants).select(
            F.expr("doc_id div 2").alias("doc_id"),
            (F.col("doc_id") % 2).alias("is_mut"),
            "simhash",
        )
        both = vfp.groupBy("doc_id").agg(
            F.max(
                F.when(F.col("is_mut") == 0, F.col("simhash"))
            ).alias("clone_fp"),
            F.max(
                F.when(F.col("is_mut") == 1, F.col("simhash"))
            ).alias("mut_fp"),
        )
        cert = (
            votes.filter(F.col("doc_id") % mod == 0)
            .select(
                "doc_id",
                _fingerprint_expr().alias("fp"),
                margin.alias("margin_bits"),
            )
            .join(both, "doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_sample"),
                F.bool_and(F.col("clone_fp") == F.col("fp")).alias(
                    "clone_ok"
                ),
                F.bool_and(
                    F.bit_count(F.col("fp").bitwiseXOR(F.col("mut_fp")))
                    <= F.col("margin_bits")
                ).alias("mut_ok"),
            )
            .collect()[0]
        )
    finally:
        votes.unpersist()
    return spark.createDataFrame(
        [
            (
                n_docs,
                int(cert["n_sample"]),
                bool(in_range),
                bool(cert["clone_ok"]),
                bool(cert["mut_ok"]),
            )
        ],
        "n_docs bigint, n_sample_docs bigint, "
        "fingerprints_in_range boolean, clone_fp_identical boolean, "
        "mutation_within_margin boolean",
    )


def simhash_blocked_rows(fp: DataFrame) -> DataFrame:
    """(doc_id, simhash, block_id, block_val): each fingerprint
    exploded into its 4 pigeonhole block keys — the bucket table the
    Hamming join self-joins. Split out (optimization r15) so callers
    own the persist/unpersist of the dual-consumed table instead of
    simhash_hamming_pairs leaking a cache entry per call."""
    block_mask = (1 << _SIMHASH_BLOCK_BITS) - 1
    return fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), _SIMHASH_BLOCK_BITS * b)
                    .bitwiseAND(F.lit(block_mask))
                    .cast("int")
                    for b in range(_SIMHASH_N_BLOCKS)
                ]
            )
        ).alias("block_id", "block_val"),
    )


def simhash_hamming_pairs(
    fp: DataFrame,
    max_hamming: int = _SIMHASH_MAX_HAMMING,
    caches: list | None = None,
) -> DataFrame:
    """EXACT-recall blocked Hamming join over (doc_id, simhash).

    Pigeonhole blocking: split the 60-bit fingerprint into 4 blocks of
    15 bits. Two fingerprints within Hamming distance d ≤ 3 differ in
    at most 3 of the 4 blocks, so they AGREE EXACTLY on at least one
    block — joining per (block_id, block_value) and unioning the four
    block joins therefore finds every qualifying pair (2 half-blocks
    would NOT: 3 bits can split 2+1 across the halves, matching
    neither). Cost is ~4× the candidate rows of a single-block scheme
    and still never all-pairs; the shuffle key is (block_id,
    block_value) with 32768 values per block, so expected bucket size
    is n/32768 and a hot block value is the skew bound, not n².

    Requires max_hamming < n_blocks for the pigeonhole guarantee.
    The blocked table feeds both self-join sides, so it is persisted
    here; pass `caches` to receive the persisted DataFrame for
    release once the result is materialized (the shingle_jaccard_pairs
    convention) — the registered queries instead build
    simhash_blocked_rows themselves under try/finally.
    """
    blocked = simhash_blocked_rows(fp).persist()
    if caches is not None:
        caches.append(blocked)
    return simhash_pairs_from_blocked(blocked, max_hamming)


def simhash_pairs_from_blocked(
    blocked: DataFrame,
    max_hamming: int = _SIMHASH_MAX_HAMMING,
    deduped: bool = True,
) -> DataFrame:
    """The Hamming join itself, over a caller-owned (ideally persisted)
    simhash_blocked_rows table — see simhash_hamming_pairs for the
    pigeonhole recall argument. `deduped=False` keeps a pair once per
    agreeing block (multiplicity k <= 4) and skips the pair-key
    exchange — correct for multiplicity-insensitive consumers (the
    production summary's flags)."""
    if max_hamming >= _SIMHASH_N_BLOCKS:
        # real ValueError, not assert (survives python -O): beyond the
        # pigeonhole bound the block join silently MISSES qualifying
        # pairs — a recall hole, not a crash, so it must be loud.
        raise ValueError(
            f"max_hamming={max_hamming} breaks the pigeonhole "
            f"guarantee: must be < {_SIMHASH_N_BLOCKS} blocks"
        )
    a, b = blocked.alias("a"), blocked.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    out = (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    if deduped:
        # a pair agreeing on k blocks appears k times — one exchange on
        # the (doc_a, doc_b) key dedups
        out = out.dropDuplicates(["doc_a", "doc_b"])
    return out


@register(
    "q_dedup_simhash_pairs",
    oracle="""
    SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
           TRUE AS pairs_ordered,
           TRUE AS hamming_within_bound,
           TRUE AS fingerprints_in_range
    """,
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: ALL document pairs whose 60-bit
    fingerprints are within Hamming distance 3, via exact-recall
    pigeonhole blocking on 4×15-bit fingerprint blocks (see
    simhash_hamming_pairs; property-tested against brute force, and
    sample-certified by q_dedup_simhash_pairs_cert). This is the
    PRODUCTION plan the bench measures — no brute-force arm.

    Fingerprint values are xxhash64-based, so no SQL oracle can
    recompute the raw pair rows — the query returns a flag-bearing
    summary of the FULL blocked pair set (VERDICT r14 item 1, the
    q_dedup_simhash pattern), all pipeline work still benched:
    DuckDB pins the exact corpus doc count plus TRUE flags for
    pairs_ordered (doc_a < doc_b everywhere), hamming_within_bound
    (every emitted pair's recomputed popcount distance ∈ [0, 3]) and
    fingerprints_in_range (every fingerprint ∈ [0, 2^60), checked
    corpus-wide from the same blocked table the join consumes). Empty
    pair sets certify vacuously (coalesce TRUE)."""
    fp = simhash_fingerprints(load_table(spark, sf_dir, "documents"))
    # blocked feeds both self-join sides AND the corpus-wide head agg;
    # persist + try/finally so no cache survives the return (VERDICT
    # r14 item 9).
    blocked = simhash_blocked_rows(fp).persist()
    try:
        out = simhash_pairs_summary(blocked).localCheckpoint(eager=True)
    finally:
        blocked.unpersist()
    return out


def simhash_pairs_summary(blocked: DataFrame) -> DataFrame:
    """LAZY 1-row flag summary over the blocked Hamming pairs of a
    (persisted) simhash_blocked_rows table — the plan
    q_dedup_simhash_pairs checkpoints. deduped=False + violation-count
    flags: same rationale as near_minhash_summary."""
    pairs = simhash_pairs_from_blocked(blocked, deduped=False)
    flags = pairs.agg(
        (_violations(F.col("doc_a") < F.col("doc_b")) == 0).alias(
            "pairs_ordered"
        ),
        (
            _violations(
                (F.col("hamming") >= 0)
                & (F.col("hamming") <= _SIMHASH_MAX_HAMMING)
            )
            == 0
        ).alias("hamming_within_bound"),
    )
    # one row per doc (block 0): corpus count + range flag without a
    # second fingerprint pass
    head = blocked.filter(F.col("block_id") == 0).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            _violations(
                (F.col("simhash") >= 0)
                & (F.col("simhash") < F.lit(1 << _SIMHASH_BITS))
            )
            == 0
        ).alias("fingerprints_in_range"),
    )
    return head.crossJoin(flags).select(
        "n_docs",
        "pairs_ordered",
        "hamming_within_bound",
        "fingerprints_in_range",
    )


_SIMHASH_CERT_PAIR_BUDGET = 20_000  # brute-force pair budget for the
# certification sample (VERDICT r13 item 2: the modulus is DERIVED —
# mod = ceil(n / sqrt(2·budget)) keeps C(n/mod, 2) ≈ budget at ANY
# fixture scale, where the old constant mod 37 grew O(n²))


def simhash_cert_mod(n_docs: int) -> int:
    """Budget-derived sample modulus: C(n/mod, 2) ≤ ~budget pairs."""
    import math

    return max(
        1, math.ceil(n_docs / math.sqrt(2 * _SIMHASH_CERT_PAIR_BUDGET))
    )


@register(
    "q_dedup_simhash_pairs_cert",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS c FROM documents),
         m AS (SELECT GREATEST(1, CAST(CEIL(
                   c / SQRT(2 * {_SIMHASH_CERT_PAIR_BUDGET})) AS BIGINT))
                   AS md
               FROM n)
    SELECT n.c AS n_docs,
           (SELECT COUNT(*) FROM documents, m
            WHERE doc_id % m.md = 0) AS n_sample_docs,
           TRUE AS blocking_exact_on_sample,
           TRUE AS fingerprints_in_range
    FROM n
    """,
)
def q_dedup_simhash_pairs_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-exactness certification twin of q_dedup_simhash_pairs
    (VERDICT r13 item 1: the brute-force arm is its own registered
    query so the production plan stays lean). Fingerprint values are
    xxhash64-based, so no SQL oracle can recompute them — but the
    BLOCKING CLAIM is checkable: on a deterministic budget-bounded
    doc sample (mod = ceil(n/√(2·budget)) keeps the all-pairs verify
    at ~{_SIMHASH_CERT_PAIR_BUDGET} pairs at ANY corpus size), the
    blocked pipeline's pair set must EQUAL the brute-force
    hamming ≤ 3 set — both directions, so the pigeonhole blocking's
    exact recall AND the hamming filter's precision are pinned.
    DuckDB pins the exact corpus/sample doc counts (same modulus
    formula in SQL); a broken block split, mask, or popcount flips a
    flag and fails the hash. (The full-corpus pair surface remains
    property-tested against brute force in tests/test_dedup.py;
    fingerprint range ⊂ [0, 2^60) is the second flag.)"""
    fp = (
        simhash_fingerprints(load_table(spark, sf_dir, "documents"))
        .persist()
    )
    blocked_rows_t = None
    try:
        in_range = fp.agg(
            F.bool_and(
                (F.col("simhash") >= 0)
                & (F.col("simhash") < F.lit(1 << _SIMHASH_BITS))
            ).alias("ok"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        mod = simhash_cert_mod(int(in_range["n"]))
        sample = fp.filter(F.col("doc_id") % mod == 0)
        blocked_rows_t = simhash_blocked_rows(sample).persist()
        blocked = simhash_pairs_from_blocked(blocked_rows_t).select(
            "doc_a", "doc_b"
        )
        a = sample.alias("a")
        b = sample.alias("b")
        ham = F.bit_count(
            F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
        )
        brute = (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .filter(ham <= _SIMHASH_MAX_HAMMING)
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
        )
        # set equality in ONE job (optimization r14, same move as
        # q_dedup_incremental_cert): tag blocked +1 / brute -1, group
        # by the pair — equal iff every group sums to zero; the
        # sampled doc count rides the same job via crossJoin of the
        # two 1-row aggregates (was 3 jobs: two exceptAll counts + a
        # count).
        tagged = blocked.withColumn("w", F.lit(1)).unionByName(
            brute.withColumn("w", F.lit(-1))
        )
        mism = (
            tagged.groupBy("doc_a", "doc_b")
            .agg(F.sum("w").alias("s"))
            .filter(F.col("s") != 0)
            .agg(F.count(F.lit(1)).alias("sym_diff"))
        )
        row = mism.crossJoin(
            sample.agg(F.count(F.lit(1)).alias("n_sample"))
        ).collect()[0]
        sym_diff = int(row["sym_diff"])
        n_sample = int(row["n_sample"])
    finally:
        if blocked_rows_t is not None:
            blocked_rows_t.unpersist()
        fp.unpersist()
    return spark.createDataFrame(
        [
            (
                int(in_range["n"]),
                n_sample,
                bool(sym_diff == 0),
                bool(in_range["ok"]),
            )
        ],
        "n_docs bigint, n_sample_docs bigint, "
        "blocking_exact_on_sample boolean, fingerprints_in_range boolean",
    )


# ---------------------------------------------------------------------------
# Fuzzy entity resolution: edit-distance-1 matching via deletion
# neighborhoods (the SymSpell / symmetric-delete blocking scheme, a
# public spelling-correction technique).  Two strings at Levenshtein
# distance <= 1 MUST share a member of {s} ∪ {s minus one char}:
#   - equality            -> share s itself;
#   - one substitution    -> share the deletion at the substituted pos;
#   - one insert/delete   -> the longer string's deletion is the shorter
#                            string itself.
# So exploding each name into its <= len+1 deletion variants and
# equi-joining on the variant gives EXACT recall for d<=1 with zero
# all-pairs work — the candidate set is bounded by variant-key
# collisions, not n².  The reference engine has no string matcher
# (kernel.cu:42-219 is numeric); this is the training-data-pipeline
# entity-resolution tier the brief asks for beyond the reference.
# At 100 TB: explode is map-side (len+1 rows per name), the single
# shuffle is the variant equi-join; variant keys are near-unique for
# real name corpora, and a df cap on pathological variants (all-equal
# strings) would bound fan-out the same way _JACCARD_DF_CUTOFF does.
# ---------------------------------------------------------------------------


def deletion_variants(col: str) -> F.Column:
    """Array of single-character-deletion variants of `col`, plus the
    string itself (distinct). Pure JVM higher-order functions — no
    Python in the hot path: delete at 1-based pos i is
    concat(substr(s, 1, i-1), substr(s, i+1))."""
    s = F.col(col)
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substr(s, F.lit(1), i - F.lit(1)),
            F.substr(s, i + F.lit(1), F.length(s)),
        ),
    )
    return F.array_distinct(F.concat(F.array(s), dels))


def fuzzy_ed1_pairs(
    df: DataFrame, id_col: str, name_col: str
) -> DataFrame:
    """All (id_a, id_b, dist) pairs whose names are within Levenshtein
    distance 1, via deletion-neighborhood blocking (exact recall — see
    module note). One explode + one equi-join shuffle; the final
    levenshtein() verify runs only on candidates sharing a variant."""
    v = df.select(
        F.col(id_col).alias("_id"),
        F.col(name_col).alias("_name"),
        F.explode(deletion_variants(name_col)).alias("_variant"),
    )
    # Explicit-N repartition on the join key: the candidate pairs are
    # byte-cheap but levenshtein-expensive, so AQE's size-based
    # coalescing would otherwise fold the post-shuffle verify into a
    # handful of tasks (measured 9.0 s -> 2.9 s at sf0.1 on local[32]).
    # Both aliases inherit the same partitioning, so the self-join adds
    # no further exchange.
    n_part = df.sparkSession.sparkContext.defaultParallelism * 2
    v = v.repartition(n_part, "_variant")
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, (F.col("a._variant") == F.col("b._variant")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.levenshtein(F.col("a._name"), F.col("b._name"))
            .cast("long")
            .alias("dist"),
        )
        .filter(F.col("dist") <= 1)
        # a pair may share several variants (e.g. equal strings) — one
        # exchange on the pair key dedups
        .dropDuplicates(["id_a", "id_b"])
    )


@register(
    "q_dedup_fuzzy_names",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def q_dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution: customer-name pairs within edit
    distance 1, blocked by SymSpell deletion neighborhoods — the
    oracle is the brute-force O(n²) levenshtein join, so a hash match
    proves the blocking loses no pairs. At 100 TB the Spark side does
    len+1 map-side variants per name and ONE equi-join shuffle where
    the oracle's all-pairs form is infeasible."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return fuzzy_ed1_pairs(c, "c_custkey", "c_name")


_CONTAINMENT_THRESHOLD_E4 = 6000  # c >= 0.60


@register(
    "q_dedup_containment",
    oracle=f"""
    WITH toks0 AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents
    ), keydf AS (
        SELECT token FROM toks0
        GROUP BY token HAVING COUNT(*) <= {_JACCARD_DF_CUTOFF}
    ), toks AS (
        SELECT t.* FROM toks0 t JOIN keydf k ON t.token = k.token
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM toks a JOIN toks b
          ON a.token = b.token AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), scored AS (
        SELECT i.doc_a, i.doc_b, i.n_inter,
               CAST(FLOOR(CAST(i.n_inter AS DOUBLE)
                          / LEAST(sa.n_tok, sb.n_tok) * 10000 + 0.5)
                    AS BIGINT) AS containment_e4
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
    )
    SELECT doc_a, doc_b, n_inter, containment_e4
    FROM scored WHERE containment_e4 >= {_CONTAINMENT_THRESHOLD_E4}
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set CONTAINMENT near-dup pairs: |A∩B| / min(|A|,|B|) —
    the asymmetric-overlap measure that catches quote-inclusion and
    subset duplicates (a short doc fully embedded in a long one scores
    1.0 here but low Jaccard, because the union is dominated by the
    long doc). Complements q_dedup_ngram_jaccard in the dedup family;
    blocking is token-equality alone (a contained doc has a DIFFERENT
    length, so Jaccard's (lang, tlen) composite block key would kill
    exactly the pairs this measure exists to find) with the same
    df <= {_JACCARD_DF_CUTOFF} cutoff bounding the self-join fan-out.
    ONE data-proportional exchange (the token self-join); the score is
    one IEEE division of exact small integers, floor-scaled e4, so the
    threshold cannot flip across engines."""
    d = load_table(spark, sf_dir, "documents")
    toks0 = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    )
    keep = (
        toks0.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _JACCARD_DF_CUTOFF)
        .drop("df")
    )
    toks = toks0.join(keep, "token", "left_semi").persist()
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    a, b = toks.alias("a"), toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    scored = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.floor(
                F.col("n_inter").cast("double")
                / F.least("sa.n_tok", "sb.n_tok")
                * 10000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("containment_e4"),
        )
    )
    return scored.filter(
        F.col("containment_e4") >= _CONTAINMENT_THRESHOLD_E4
    )


# ---------------------------------------------------------------------------
# Incremental corpus dedup (VERDICT r8 item 6): the 100 TB corpus is
# deduped ONCE, its MinHash band table persisted to the versioned log
# (sources/versioned.py — the sketch_persist.py pattern applied to LSH
# state); every NEW batch then dedups against the corpus by joining its
# own band rows to the persisted band table — no corpus rescan, ever.
# Batch cost: O(|batch| signatures) + one bucket join against the band
# log; appending the batch's band rows (append_version) extends the log
# for the next batch at O(|batch|) I/O.
# ---------------------------------------------------------------------------


def incremental_band_pairs(
    new_bands: DataFrame, corpus_bands: DataFrame, deduped: bool = True
) -> DataFrame:
    """Candidate near-dup pairs INVOLVING the new batch: join the
    batch's band rows against (corpus ∪ batch) band rows on the LSH
    bucket key, normalize each pair to (lower id, higher id) so
    batch-vs-batch pairs found from both sides dedup away, and score
    by signature agreement — identical estimator to
    minhash_band_pairs, so incremental ∪ corpus-internal == full
    recompute exactly (pinned by tests/test_dedup.py). Corpus-internal
    pairs never form: the left leg is always a batch row."""
    all_bands = corpus_bands.unionByName(new_bands)
    n, c = new_bands.alias("n"), all_bands.alias("c")
    lo_first = F.col("n.doc_id") < F.col("c.doc_id")
    lo = F.when(
        lo_first, F.struct(F.col("n.doc_id").alias("doc_id"), F.col("n.sig").alias("sig"))
    ).otherwise(F.struct(F.col("c.doc_id").alias("doc_id"), F.col("c.sig").alias("sig")))
    hi = F.when(
        lo_first, F.struct(F.col("c.doc_id").alias("doc_id"), F.col("c.sig").alias("sig"))
    ).otherwise(F.struct(F.col("n.doc_id").alias("doc_id"), F.col("n.sig").alias("sig")))
    pairs = (
        n.join(
            c,
            (F.col("n.band_id") == F.col("c.band_id"))
            & (F.col("n.band_sig") == F.col("c.band_sig"))
            & (F.col("n.doc_id") != F.col("c.doc_id")),
        )
        .select(
            lo["doc_id"].alias("doc_a"),
            lo["sig"].alias("sig_a"),
            hi["doc_id"].alias("doc_b"),
            hi["sig"].alias("sig_b"),
        )
    )
    if deduped:
        pairs = pairs.dropDuplicates(["doc_a", "doc_b"])
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    ).cast("double") / F.lit(float(_N_HASHES))
    return pairs.select("doc_a", "doc_b", est.alias("jaccard_est"))


def ensure_minhash_band_log(spark: SparkSession, sf_dir: str) -> str:
    """Versioned band log of the BASE corpus (doc_id % 4 != 0):
    (doc_id, sig, band_id, band_sig) rows committed once per fixture
    content (idempotent, fingerprint-keyed)."""
    import os
    import tempfile

    from meta_iterative_mapreduce_spark.io import fixture_fingerprint
    from meta_iterative_mapreduce_spark.sources import versioned

    table = os.path.join(
        tempfile.gettempdir(),
        "mimr_versioned",
        f"minhash_bands_{fixture_fingerprint(sf_dir, 'documents')}",
    )
    if len(versioned.versions(table)) == 0:
        base = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 4 != 0
        )
        versioned.write_version(
            band_rows(minhash_signatures(base)), table
        )
    return table


@register(
    "q_dedup_incremental",
    oracle="""
    SELECT (SELECT CAST(SUM(CASE WHEN doc_id % 4 != 0 THEN 1 ELSE 0 END)
                        AS BIGINT) FROM documents) AS n_base_docs,
           (SELECT CAST(SUM(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) FROM documents) AS n_batch_docs,
           TRUE AS pairs_ordered,
           TRUE AS batch_in_every_pair,
           TRUE AS est_in_band_range
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-incremental near-dup detection WITHOUT a corpus rescan:
    the base corpus's LSH band table lives in the versioned log
    (ensure_minhash_band_log — written once, appended per batch); a
    new batch (doc_id % 4 == 0) computes only ITS signatures and joins
    them against the persisted bands, at per-batch cost independent of
    corpus size — the only sustainable dedup shape for a growing
    100 TB corpus. This is the PRODUCTION plan the bench measures;
    the union-equals-full-recompute contract is certified by
    q_dedup_incremental_cert and pytest-pinned by
    tests/test_dedup.py::test_incremental_dedup_equals_full_recompute.

    Signature values are xxhash64-based, so no SQL oracle can
    recompute the raw pair rows — the query returns a flag-bearing
    summary of the FULL incremental pair set (VERDICT r14 item 1, the
    q_dedup_simhash pattern), all pipeline work still benched: DuckDB
    pins the exact base/batch doc counts (same %4 split formula) plus
    TRUE flags for pairs_ordered (the lo/hi normalization held),
    batch_in_every_pair (every pair involves >= 1 batch doc — the
    defining claim that the join's left leg is always the batch, never
    corpus-internal) and est_in_band_range (jaccard_est ∈ [4/32, 1] —
    the banding floor). Empty pair sets certify vacuously."""
    from meta_iterative_mapreduce_spark.sources import versioned

    table = ensure_minhash_band_log(spark, sf_dir)
    corpus_bands = versioned.read_version(spark, table)
    d = load_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 4 == 0)
    # The batch band table feeds TWO legs of incremental_band_pairs
    # (the left join side and the corpus∪batch union) — persist so the
    # batch's shingle/signature pass runs once, released before return.
    new_bands = band_rows(minhash_signatures(batch)).persist()
    try:
        out = incremental_summary(d, new_bands, corpus_bands).localCheckpoint(
            eager=True
        )
    finally:
        new_bands.unpersist()
    return out


def incremental_summary(
    d: DataFrame, new_bands: DataFrame, corpus_bands: DataFrame
) -> DataFrame:
    """LAZY 1-row flag summary over the incremental band pairs of a
    (persisted) batch band table vs the corpus band log — the plan
    q_dedup_incremental checkpoints. deduped=False + violation-count
    flags: same rationale as near_minhash_summary."""
    pairs = incremental_band_pairs(new_bands, corpus_bands, deduped=False)
    flags = pairs.agg(
        (_violations(F.col("doc_a") < F.col("doc_b")) == 0).alias(
            "pairs_ordered"
        ),
        (
            _violations(
                (F.col("doc_a") % 4 == 0) | (F.col("doc_b") % 4 == 0)
            )
            == 0
        ).alias("batch_in_every_pair"),
        (
            _violations(
                (F.col("jaccard_est") >= F.lit(_BAND_EST_FLOOR))
                & (F.col("jaccard_est") <= F.lit(1.0))
            )
            == 0
        ).alias("est_in_band_range"),
    )
    counts = d.agg(
        F.sum(F.when(F.col("doc_id") % 4 != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_base_docs"),
        F.sum(F.when(F.col("doc_id") % 4 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_batch_docs"),
    )
    return counts.crossJoin(flags)


_INC_CERT_DOC_BUDGET = 20_000  # doc budget for the from-scratch
# recompute arm in q_dedup_incremental_cert (VERDICT r13 item 2: the
# equality check runs on a deterministic doc sample whose size is
# BOUNDED — mod = ceil(n/budget) — so the cert twin survives fixture
# growth; at today's fixtures mod = 1, i.e. the full contract)


@register(
    "q_dedup_incremental_cert",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS c FROM documents),
         m AS (SELECT GREATEST(1, CAST(CEIL(
                   c / {_INC_CERT_DOC_BUDGET}.0) AS BIGINT)) AS md
               FROM n)
    SELECT (SELECT CAST(SUM(CASE WHEN doc_id % 4 != 0 THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM documents, m WHERE (doc_id // 4) % m.md = 0)
               AS n_base_docs,
           (SELECT CAST(SUM(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM documents, m WHERE (doc_id // 4) % m.md = 0)
               AS n_batch_docs,
           TRUE AS union_equals_full,
           TRUE AS no_pair_overlap
    FROM n
    """,
)
def q_dedup_incremental_cert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification twin of q_dedup_incremental (VERDICT r13 item 1:
    the from-scratch recompute arm is its own registered query so the
    benched production plan stays per-batch-bounded). The incremental
    path's defining CONTRACT — batch pairs unioned with the base
    corpus's internal pairs equal the from-scratch full recompute
    EXACTLY (same (doc_a, doc_b, signature-agreement estimate)
    triples), and the two sets never overlap — is evaluated on a
    deterministic budget-bounded doc sample (restricting every leg to
    (doc_id div 4) % mod == 0 — blocks of 4 consecutive ids, so the
    sample always straddles the %4 base/batch split — commutes with
    the band join: a sampled pair exists in the restricted run iff it
    exists in the full run, so the restricted equality is exact, not
    approximate). DuckDB pins
    the sampled base/batch doc counts (same modulus formula in SQL)
    and TRUE flags. A stale band log, a lossy band join, or a
    double-emitted pair flips a flag and fails the hash."""
    import math

    from meta_iterative_mapreduce_spark.sources import versioned

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    mod = max(1, math.ceil(n_docs / _INC_CERT_DOC_BUDGET))
    in_sample = F.expr(f"(doc_id div 4) % {mod} = 0")
    table = ensure_minhash_band_log(spark, sf_dir)
    corpus_bands = versioned.read_version(spark, table).filter(in_sample)
    ds = d.filter(in_sample)
    # ONE signature pass: a MinHash signature is a pure function of the
    # document, so the base and batch signature tables are FILTERS of
    # the sampled corpus's table, not separate shingle/hash passes
    # (optimization r14 — was three minhash_signatures pipelines; the
    # certified band-join contract is unchanged because the joins still
    # run on exactly the same signature values).
    full_sigs = minhash_signatures(ds).persist()
    base_sigs = full_sigs.filter(F.col("doc_id") % 4 != 0)
    new_bands = band_rows(
        full_sigs.filter(F.col("doc_id") % 4 == 0)
    ).persist()
    # The pair sets feeding two counts each stay persisted, or every
    # set-op re-runs the band self-joins (the expensive legs).
    inc = incremental_band_pairs(new_bands, corpus_bands).persist()
    base_pairs = minhash_band_pairs(base_sigs).persist()
    full = minhash_band_pairs(full_sigs)
    try:
        key = ["doc_a", "doc_b", "jaccard_est"]
        got = base_pairs.select(*key).union(inc.select(*key))
        # multiset equality in ONE pass: tag got rows +1 and full rows
        # -1, group by the full triple — equal iff every group sums to
        # zero (replaces the two exceptAll jobs; guide §1.2 step 1:
        # don't run two O(n) set ops where one aggregate answers both)
        mismatch = (
            got.withColumn("w", F.lit(1))
            .unionByName(
                full.select(*key).withColumn("w", F.lit(-1))
            )
            .groupBy(*key)
            .agg(F.sum("w").alias("s"))
            .filter(F.col("s") != 0)
            .count()
        )
        overlap = (
            base_pairs.select("doc_a", "doc_b")
            .intersect(inc.select("doc_a", "doc_b"))
            .count()
        )
        # both sampled doc counts from one aggregate job
        counts = ds.agg(
            F.sum(
                F.when(F.col("doc_id") % 4 != 0, 1).otherwise(0)
            ).alias("n_base"),
            F.sum(
                F.when(F.col("doc_id") % 4 == 0, 1).otherwise(0)
            ).alias("n_batch"),
        ).collect()[0]
        n_base = int(counts["n_base"] or 0)
        n_batch = int(counts["n_batch"] or 0)
    finally:
        # ADVICE r13: release the cached signature/band/pair state
        # instead of letting it accumulate across a full registry run
        for cached in (new_bands, full_sigs, inc, base_pairs):
            cached.unpersist()
    return spark.createDataFrame(
        [
            (
                n_base,
                n_batch,
                bool(mismatch == 0),
                bool(overlap == 0),
            )
        ],
        "n_base_docs bigint, n_batch_docs bigint, "
        "union_equals_full boolean, no_pair_overlap boolean",
    )


@register(
    "q_dedup_substring",
    oracle="""
    WITH grams AS (
        SELECT doc_id, substr(text, CAST(i AS INT), 40) AS gram
        FROM (
            SELECT doc_id, text,
                   unnest(range(1, CAST(n_chars - 38 AS BIGINT))) AS i
            FROM documents WHERE n_chars >= 40
        )
    ), dd AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT doc_id, COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN gram IN (SELECT gram FROM dd)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
    FROM grams GROUP BY doc_id
    """,
)
def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SUBSTRING deduplication at span granularity — the
    'duplicated text within a document' metric of suffix-array corpus
    dedup (repeated 40-char spans across distinct documents), the
    family member MinHash/SimHash can't express: they score whole-doc
    similarity, this finds verbatim shared spans inside otherwise
    different docs. Distributed form: every position's 40-gram
    (JVM sequence + substring — one narrow projection, no Python),
    grams repeated across >= 2 distinct docs found with ONE gram-keyed
    aggregate, flagged back onto positions by a join that reuses the
    same gram partitioning (AQE), then a per-doc rollup. This sorted
    k-gram bucketing is the distributed analog of the suffix-array
    scan; at 100 TB the gram key is xxhash64'd to 8 bytes before the
    shuffle and boilerplate-hot grams get df-capped exactly like
    q_dedup_ngram_jaccard's token blocking — same plan shape, narrower
    exchange. Counts are exact integers; docs shorter than the gram
    width drop from both engines identically."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") >= 40)
        .select("doc_id", "text", F.col("n_chars").cast("int").alias("nc"))
        # the gram GENERATE fans each doc out ~n_chars×: a single-file
        # corpus scan would run that (and the map-side partial aggs)
        # on one core, so rebalance the narrow doc rows BEFORE the
        # explosion — the shuffle moves docs, never grams. The count
        # is EXPLICIT because the pre-explode bytes are tiny and AQE
        # would otherwise coalesce the exchange right back to one
        # partition, defeating the rebalance.
        .repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions")),
            F.col("doc_id"),
        )
    )
    grams = d.select(
        "doc_id",
        F.expr("explode(sequence(1, nc - 39))").alias("i"),
        "text",
    ).select("doc_id", F.expr("substring(text, i, 40)").alias("gram"))
    # ONE explicit gram exchange feeds everything downstream: the
    # (gram, doc_id) occurrence collapse needs no further shuffle
    # (gram-partitioning clusters its keys), the per-gram doc count
    # aggregates in place, and the flag join is co-partitioned — so
    # the wide 40-byte gram strings cross the wire exactly once.
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    g2 = grams.repartition(n_parts, F.col("gram"))
    pairs = g2.groupBy("gram", "doc_id").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    per_gram = pairs.groupBy("gram").agg(F.count(F.lit(1)).alias("nd"))
    return (
        pairs.join(per_gram, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("n_occ").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("nd") >= 2, F.col("n_occ")).otherwise(0))
            .cast("bigint")
            .alias("n_dup_grams"),
        )
    )
