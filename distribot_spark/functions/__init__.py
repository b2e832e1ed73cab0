"""Shared column-expression helpers (determinism, money math)."""

from distribot_spark.functions.determinism import money, money_sum, stable_round

__all__ = ["stable_round", "money", "money_sum"]
