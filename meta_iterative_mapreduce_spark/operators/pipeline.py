"""End-to-end corpus-cleaning pipeline — the composition a training-
data run actually executes: quality gate → language agreement → near-
dup canonical pick → per-source acceptance stats, in ONE declarative
plan plus the iterative connected-components stage.

Each stage is an operator that is independently oracle-checked
(q_text_quality, q_text_langid, q_dedup_components); this query pins
that the COMPOSITION stays correct — joins on doc_id, no row
duplication across stages, counts consistent per source.

At 100 TB: the quality/langid flags are scan-local expressions (no
shuffle), the dedup-keep join is one shuffle on doc_id, and the final
rollup groups by the low-cardinality source key with map-side combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.operators.components import (
    _COMPONENTS_CTE,
    q_dedup_components,
)
from meta_iterative_mapreduce_spark.operators.dedup import _JACCARD_PAIRS_CTE
from meta_iterative_mapreduce_spark.operators.text import _LEXICONS, _lex_sql
from meta_iterative_mapreduce_spark.registry import register

_STOPWORDS = ("the", "of", "and", "a", "scan", "join")
_STOP_RATIO_MAX = 0.3  # single int/int division → engine-deterministic


@register(
    "q_pipeline_corpus_clean",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_PAIRS_CTE}, {_COMPONENTS_CTE},
    keepers AS (
        SELECT d.doc_id,
               COALESCE(LEAST(c.m, d.doc_id), d.doc_id) = d.doc_id AS keep
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    flags AS (
        SELECT doc_id, source,
               LENGTH(string_split(text, ' ')) BETWEEN 20 AND 80
                 AND CAST(LENGTH(list_filter(string_split(text, ' '),
                     x -> list_contains({list(_STOPWORDS)}, x))) AS DOUBLE)
                     / LENGTH(string_split(text, ' ')) <= {_STOP_RATIO_MAX}
                 AS q_ok,
               (CASE WHEN {_lex_sql('de')} >= {_lex_sql('en')}
                      AND {_lex_sql('de')} >= {_lex_sql('es')}
                      AND {_lex_sql('de')} >= {_lex_sql('fr')} THEN 'de'
                     WHEN {_lex_sql('en')} >= {_lex_sql('es')}
                      AND {_lex_sql('en')} >= {_lex_sql('fr')} THEN 'en'
                     WHEN {_lex_sql('es')} >= {_lex_sql('fr')} THEN 'es'
                     ELSE 'fr' END) = lang AS lang_ok
        FROM documents
    )
    SELECT f.source,
           COUNT(*) AS n_docs,
           COUNT(CASE WHEN f.q_ok THEN 1 END) AS n_quality,
           COUNT(CASE WHEN f.q_ok AND f.lang_ok THEN 1 END) AS n_lang,
           COUNT(CASE WHEN f.q_ok AND f.lang_ok AND k.keep THEN 1 END)
               AS n_final
    FROM flags f JOIN keepers k ON k.doc_id = f.doc_id
    GROUP BY f.source
    """,
)
def q_pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cleaning funnel per source: total docs → passing the
    quality gate (length 20-80 tokens, stopword ratio ≤ 0.3) → whose
    predicted language agrees with the labeled one → surviving near-dup
    dedup as the canonical component representative."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in _STOPWORDS])
    stop_ratio = (
        F.size(F.filter(toks, lambda x: F.array_contains(stop, x))).cast("double")
        / F.size(toks)
    )
    q_ok = F.size(toks).between(20, 80) & (stop_ratio <= _STOP_RATIO_MAX)

    def score(lang: str):
        lex = F.array(*[F.lit(w) for w in _LEXICONS[lang]])
        return F.size(F.filter(toks, lambda x: F.array_contains(lex, x)))

    s_en, s_es, s_de, s_fr = (score(lg) for lg in ("en", "es", "de", "fr"))
    lang_pred = (
        F.when((s_de >= s_en) & (s_de >= s_es) & (s_de >= s_fr), "de")
        .when((s_en >= s_es) & (s_en >= s_fr), "en")
        .when(s_es >= s_fr, "es")
        .otherwise("fr")
    )
    flags = d.select(
        "doc_id",
        "source",
        q_ok.alias("q_ok"),
        (lang_pred == F.col("lang")).alias("lang_ok"),
    )
    keepers = q_dedup_components(spark, sf_dir).select("doc_id", "keep")
    return (
        flags.join(keepers, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("q_ok"), 1)).alias("n_quality"),
            F.count(F.when(F.col("q_ok") & F.col("lang_ok"), 1)).alias("n_lang"),
            F.count(
                F.when(F.col("q_ok") & F.col("lang_ok") & F.col("keep"), 1)
            ).alias("n_final"),
        )
    )
