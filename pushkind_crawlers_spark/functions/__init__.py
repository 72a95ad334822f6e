"""Scalar / normalization functions (SURVEY.md §2.2).

Each op exists twice, by design:
* a Spark form — built-in column expressions where possible, vectorized
  pandas UDFs otherwise (never per-row Python), and
* a pure-Python twin used by the parity oracle and unit tests.
"""
