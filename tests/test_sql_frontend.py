"""SQL-string front-end breadth (VERDICT r13 item 6).

q_sql_frontend certifies `run_sql` on one demo query; this sweep
certifies the STRING surface at full relational breadth: every TPC-H
shape oracle's SQL — plus a window, a multi-CTE, and a lateral-join
string — is executed through `run_sql` and must be frame-equal to the
registered DataFrame rendering. The oracles were written as ANSI SQL
precisely so DuckDB could run them; the same discipline makes 23 of
the 25 run on Spark verbatim, and the two DuckDB-only spellings
(`strftime`) are mapped by a two-token dialect shim documented here.

A drift in either direction fails: a DataFrame plan that diverges
from its declared SQL semantics, or a Spark SQL regression that
parses/plans the string differently.
"""

from __future__ import annotations

import pandas as pd
import pytest

from meta_iterative_mapreduce_spark import registry
from meta_iterative_mapreduce_spark.sql import run_sql

# DuckDB-dialect spellings appearing in oracle SQL, mapped to the
# Spark SQL equivalent. Deliberately tiny: anything needing more than
# a token swap should be rewritten as shared ANSI in the oracle.
_DIALECT = (
    ("strftime(", "date_format("),
    ("'%Y-%m-%d'", "'yyyy-MM-dd'"),
)

_CASES = sorted(
    [f"q_tpch_q{i}_shape" for i in range(1, 23)]
    + ["q_window_ranking", "q_cte_multi", "q_join_lateral"]
)


def _to_spark_sql(sql: str) -> str:
    for duck, spark_tok in _DIALECT:
        sql = sql.replace(duck, spark_tok)
    return sql


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols].sort_values(by=cols).reset_index(drop=True)
    )


@pytest.mark.parametrize("name", _CASES)
def test_sql_string_equals_dataframe_rendering(spark, sf_dir, name):
    registry._ensure_loaded()
    q = registry.REGISTRY[name]
    assert q.oracle, f"{name} must carry a SQL oracle for this sweep"
    got = _canon(run_sql(spark, sf_dir, _to_spark_sql(q.oracle)).toPandas())
    want = _canon(q.fn(spark, sf_dir).toPandas())
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, rtol=1e-9, atol=1e-9
    )
