"""Relational operator plans (SURVEY.md §2.2 A-H).

Each module registers declarative DataFrame plans plus their DuckDB
oracle SQL. Everything stays JVM-side (built-in functions, whole-stage
codegen); Catalyst provides pushdown/pruning/join-strategy selection.
"""
