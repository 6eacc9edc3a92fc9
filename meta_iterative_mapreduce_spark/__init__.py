"""meta_iterative_mapreduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference repo `shikhar-srivastava/Meta-Iterative-MapReduce`
(a 220-line MPI+CUDA iterative linear-regression trainer,
/root/reference/kernel.cu), re-expressed Spark-first:

- the reference's two-level iterative map-reduce pattern (MPI scatter /
  CUDA per-block closed-form OLS / hierarchical reduce / EMA smoothing,
  kernel.cu:42-217) becomes declarative DataFrame aggregation plans
  (`operators.regression`),
- plus the full relational operator surface (`plans/`),
- plus LLM-data-pipeline operators: dedup, similarity search, text
  analysis, multimodal columns (`operators/`),
- plus streaming analogs of the reference's batch-sequence loop
  (`streaming/`).

Everything is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
