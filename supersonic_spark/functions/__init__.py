"""Scalar expression library (SURVEY.md §2.7).

Each module mirrors a reference header under supersonic/expression/:

- ``arithmetic``  — core/arithmetic_expressions.h
- ``comparison``  — core/comparison_expressions.h
- ``logic``       — core/elementary_expressions.h (ternary logic, If/Case)
- ``strings``     — core/string_expressions.h
- ``math_fn``     — core/math_expressions.h
- ``datetime_fn`` — core/date_expressions.h
- ``regexp_fn``   — core/regexp_expressions.h (RE2 → Java-regex dialect)
- ``hashing_fn``  — ext/hashing/hashing_expressions.h
- ``stateful``    — core/stateful_expressions.h (order-dependent)
- ``terminal``    — infrastructure/terminal_expressions.h (consts, Sequence)
- ``policy``      — the Quiet/Nulling/Signaling error-policy machinery
  (operators.proto:10-14: tag%4 encodes the policy)

All functions return pyspark ``Column`` objects and are pure — no engine
state; they compose with any DataFrame (SURVEY.md §7.1).
"""

from supersonic_spark.functions.policy import EvalPolicy, signal_if

__all__ = ["EvalPolicy", "signal_if"]
