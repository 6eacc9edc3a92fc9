"""Corpus-clean funnel invariants that the value-hash oracle doesn't
state explicitly: monotone stage counts and full-corpus coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.io import load_table
from meta_iterative_mapreduce_spark.operators.pipeline import (
    q_pipeline_corpus_clean,
)


def test_funnel_counts_are_monotone_and_cover_corpus(spark, sf_dir):
    rows = q_pipeline_corpus_clean(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs >= r.n_quality >= r.n_lang >= r.n_final >= 0, r
    total = sum(r.n_docs for r in rows)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert total == n_docs  # every document lands in exactly one source row
    # the funnel must actually filter something AND keep something
    assert sum(r.n_final for r in rows) > 0
    assert sum(r.n_final for r in rows) < total


def test_funnel_final_equals_manual_composition(spark, sf_dir):
    """n_final recomputed by composing the independent stage queries —
    guards against the pipeline drifting from its constituent parts."""
    from meta_iterative_mapreduce_spark import registry

    qs = registry.queries()
    quality = qs["q_text_quality"](spark, sf_dir).select(
        "doc_id", "n_tokens", "stopword_ratio", "len_ok"
    )
    langid = qs["q_text_langid"](spark, sf_dir).select(
        "doc_id", "lang", "lang_pred"
    )
    keep = qs["q_dedup_components"](spark, sf_dir).select("doc_id", "keep")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    manual = (
        d.join(quality, "doc_id")
        .join(langid, "doc_id")
        .join(keep, "doc_id")
        .filter(
            F.col("len_ok")
            & (F.col("stopword_ratio") <= 0.3)
            & (F.col("lang_pred") == F.col("lang"))
            & F.col("keep")
        )
        .groupBy("source")
        .count()
    )
    got = {
        r.source: r.n_final
        for r in q_pipeline_corpus_clean(spark, sf_dir).collect()
        if r.n_final > 0
    }
    want = {r.source: r["count"] for r in manual.collect()}
    assert got == want
