"""Corpus-hygiene operators for LLM training-data pipelines:
benchmark decontamination, repetition-based quality signals
(Gopher-style), and deterministic source mixing/budgeting.

These extend the reference's data-preparation role (kernel.cu:92-104
reads the training batch; these decide WHAT goes into the batch) with
the standard pre-training corpus steps. All plans are declarative
explode/window/agg pipelines — no Python in the hot path — so each is
a scan plus one or two keyed shuffles at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.registry import register

# Docs whose id falls in this residue class stand in for a held-out
# evaluation benchmark; everything else is the training corpus.
_BENCH_MOD = 97

# Per-source document budget for the mixing query (applies at every
# sf: sources have 25 docs at sf0.01, so a cap of 10 always bites).
_MIX_CAP = 10


@register(
    "q_text_decontaminate",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    ng AS (
        SELECT doc_id,
               list_extract(toks, i)     || ' ' ||
               list_extract(toks, i + 1) || ' ' ||
               list_extract(toks, i + 2) || ' ' ||
               list_extract(toks, i + 3) || ' ' ||
               list_extract(toks, i + 4) AS gram
        FROM w, LATERAL (
            SELECT unnest(range(1, len(toks) - 3)) AS i
        ) r
        WHERE len(toks) >= 5
    ),
    bench AS (
        SELECT DISTINCT gram FROM ng WHERE doc_id % {_BENCH_MOD} = 0
    ),
    hits AS (
        SELECT n.doc_id, COUNT(DISTINCT n.gram) AS n_hits
        FROM (SELECT DISTINCT doc_id, gram FROM ng
              WHERE doc_id % {_BENCH_MOD} <> 0) n
        JOIN bench b ON b.gram = n.gram
        GROUP BY n.doc_id
    )
    SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits
    FROM hits
    ORDER BY n_hits DESC, doc_id
    LIMIT 100
    """,
)
def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    word 5-gram with the held-out benchmark subset (doc_id %
    {mod} == 0) — the standard n-gram-overlap decontamination pass
    run before pre-training. The benchmark gram set is ~1% of the
    corpus, so Spark broadcasts it and the check is one scan over the
    training side with a broadcast hash semi-join per gram — no
    data-proportional shuffle. Distinct-gram sets per doc keep the
    join input bounded by document length."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    ).filter(F.size("toks") >= 5)
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 5), i -> "
                "concat_ws(' ', toks[i], toks[i+1], toks[i+2], "
                "toks[i+3], toks[i+4]))"
            )
        ).alias("gram"),
    ).distinct()
    bench = (
        grams.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select("gram")
        .distinct()
    )
    train = grams.filter(F.col("doc_id") % _BENCH_MOD != 0)
    hits = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))  # grams already distinct
    )
    return hits.orderBy(F.desc("n_hits"), "doc_id").limit(100)


@register(
    "q_text_repetition",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    bg AS (
        SELECT doc_id,
               list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                   AS gram
        FROM w, LATERAL (
            SELECT unnest(range(1, len(toks))) AS i
        ) r
        WHERE len(toks) >= 2
    ),
    cnt AS (
        SELECT doc_id, gram, COUNT(*) AS c
        FROM bg GROUP BY doc_id, gram
    ),
    per_doc AS (
        SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bigrams
        FROM cnt GROUP BY doc_id
    ),
    base AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CAST(len(toks) - len(list_distinct(toks)) AS BIGINT)
                   AS n_dup_tokens
        FROM w
    )
    SELECT b.doc_id,
           b.n_tokens,
           ROUND(CAST(b.n_dup_tokens AS DOUBLE) / b.n_tokens, 4)
               AS dup_token_frac,
           ROUND(CAST(p.top_c AS DOUBLE) / p.n_bigrams, 4)
               AS top_bigram_frac
    FROM base b JOIN per_doc p ON p.doc_id = b.doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: fraction of
    repeated tokens and the share of the most frequent bigram —
    the quality gates that drop boilerplate/spam before training.
    Plan: one explode + two hash aggs, both keyed on doc_id, so the
    second agg reuses the first's partitioning (one shuffle total);
    token-level stats come from higher-order functions on the split
    array with no explode at all."""
    w = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    bg = w.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2), i -> "
                "concat_ws(' ', toks[i], toks[i+1]))"
            )
        ).alias("gram"),
    )
    per_doc = (
        bg.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bigrams"))
    )
    base = w.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(F.array_distinct("toks")))
        .cast("long")
        .alias("n_dup_tokens"),
    )
    return base.join(per_doc, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_dup_tokens") / F.col("n_tokens"), 4).alias(
            "dup_token_frac"
        ),
        F.round(F.col("top_c") / F.col("n_bigrams"), 4).alias(
            "top_bigram_frac"
        ),
    )


@register(
    "q_corpus_mix",
    oracle=f"""
    WITH ranked AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM ranked
    WHERE rk <= {_MIX_CAP}
    GROUP BY source
    """,
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing: cap each source at a fixed
    document budget, picking docs by md5-of-id rank — a reproducible
    uniform sample per source (the way pre-training mixes re-weight
    over-represented crawls). The md5 order is engine-independent, so
    the oracle sees the identical sample. At 100 TB this is one
    window over the source partitioning; a known-skewed source can be
    pre-bucketed by hash range so no single task ranks a whole
    crawl."""
    ranked = load_table(spark, sf_dir, "documents").select(
        "source",
        "n_chars",
        F.row_number()
        .over(
            W.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("rk"),
    )
    return (
        ranked.filter(F.col("rk") <= _MIX_CAP)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
        )
    )


_WSAMPLE_K = 100


@register(
    "q_sample_weighted",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id,
               LENGTH(string_split(text, ' ')) AS w,
               -- Efraimidis–Spirakis key u^(1/w) with a DETERMINISTIC
               -- uniform u = md5-derived 32-bit fraction (reproducible
               -- across engines and runs, like q_corpus_mix's rank)
               POWER((CAST(('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                           AS BIGINT) + 1.0) / 4294967297.0,
                     1.0 / LENGTH(string_split(text, ' '))) AS k
        FROM documents
        WHERE LENGTH(string_split(text, ' ')) >= 1
    )
    SELECT doc_id, CAST(w AS BIGINT) AS weight
    FROM keyed
    ORDER BY k DESC, doc_id
    LIMIT {_WSAMPLE_K}
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): each doc gets key u^(1/w) with w = token count and u a
    deterministic md5-derived uniform; the global top-k by key IS a
    weighted sample — the standard one-pass distributed algorithm for
    mixture-weighted training-data selection. TakeOrderedAndProject
    keeps it a per-partition heap + driver merge (no global sort);
    deterministic u makes the draw reproducible across engines, runs,
    and cluster sizes (the property a lineage-auditable data pipeline
    needs from its sampler)."""
    d = load_table(spark, sf_dir, "documents")
    w = F.size(F.split("text", " "))
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        + 1.0
    ) / 4294967297.0
    keyed = d.filter(w >= 1).select(
        "doc_id",
        w.cast("bigint").alias("weight"),
        F.pow(u, 1.0 / w).alias("k"),
    )
    return (
        keyed.orderBy(F.col("k").desc(), "doc_id")
        .limit(_WSAMPLE_K)
        .select("doc_id", "weight")
    )


_BP_CHUNK = 3  # tokens per boilerplate unit
_BP_DF = 1  # drop chunks appearing in more than this many docs


@register(
    "q_text_boilerplate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               array_to_string(list_slice(t, {_BP_CHUNK} * i.i + 1,
                                          {_BP_CHUNK} * i.i + {_BP_CHUNK}),
                               ' ') AS chunk
        FROM toks,
             LATERAL (SELECT unnest(range(0, len(t) // {_BP_CHUNK})) AS i) i
    ),
    freq AS (
        SELECT chunk, COUNT(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           COUNT(CASE WHEN f.df > {_BP_DF} THEN 1 END) AS n_dropped
    FROM chunks c JOIN freq f ON f.chunk = c.chunk
    GROUP BY c.doc_id
    """,
)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal (the C4/RefinedWeb line-dedup
    pass, on token chunks since the fixture has no newlines): split
    each doc into non-overlapping {chunk}-token chunks, count each
    chunk's document frequency corpus-wide, and drop chunks appearing
    in more than {df} documents — emitted as per-doc kept/dropped
    accounting. At 100 TB: one explode + hash-agg builds the frequency
    table (map-side combined), and the chunk-keyed join back is the
    only data-proportional shuffle; the high-df chunk set is tiny
    (boilerplate is by definition concentrated) so it broadcasts in
    the production variant."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(t) DIV {_BP_CHUNK} - 1), i -> "
                f"concat_ws(' ', slice(t, {_BP_CHUNK} * i + 1, {_BP_CHUNK})))"
            )
        ).alias("chunk"),
    )
    freq = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count(F.when(F.col("df") > _BP_DF, 1)).alias("n_dropped"),
        )
    )


_DOMAIN_CAP = 30  # max documents kept per host


@register(
    "q_corpus_domain_cap",
    oracle=f"""
    WITH urls AS (
        SELECT doc_id, text,
               source || '.example.com' AS host
        FROM documents
    ), ranked AS (
        SELECT doc_id, host,
               ROW_NUMBER() OVER (PARTITION BY host
                                  ORDER BY md5(text), doc_id) AS rn
        FROM urls
    )
    SELECT doc_id, host FROM ranked WHERE rn <= {_DOMAIN_CAP}
    """,
)
def q_corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap — the RefinedWeb/C4-style anti-spam
    step: no single host may contribute more than {_DOMAIN_CAP}
    documents to the corpus. Each document's provenance URL is
    synthesized from its source/lang/id, the HOST is extracted with
    Spark's JVM-side parse_url (exercising the engine's URL function
    family — no UDF), and the per-host keep-set is the deterministic
    md5-of-content rank (no RNG state, reproducible under retries —
    same convention as q_sample_stratified). ONE exchange on host; at
    a skewed 100 TB crawl the hot-host partitions are exactly the ones
    the cap truncates, and a rank-limit window pushes the limit into
    the sort (group-limit) rather than ranking every row."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    with_host = d.select(
        "doc_id", "text", F.parse_url(url, F.lit("HOST")).alias("host")
    )
    w = W.partitionBy("host").orderBy(F.md5("text"), "doc_id")
    return (
        with_host.select(
            "doc_id", "host", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= _DOMAIN_CAP)
        .select("doc_id", "host")
    )
