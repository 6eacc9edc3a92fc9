"""Streaming operators: real Structured Streaming jobs (`jobs`) and
their deterministic batch twins (`batch_analogs`, oracle-checked)."""
