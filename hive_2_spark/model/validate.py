"""Row validation engine (SURVEY.md §2A op 28).

Reference parity: validate($context) builds a Validate object from
labels/filters/rules/callbacks, optionally scoped to a named context
(classes/hive/model.php:940-1026; meta config classes/hive/meta.php:44-61;
example rules /root/reference/README.md:42-48: not_empty, max_length,
email, min_length).

Spark-first rendering: every rule compiles to a boolean Column; a row's
error set is the array of failed-rule messages; the reject set is
``filter(size(errors) > 0)``. This runs as one codegen'd projection over
the whole table — validation of 100 TB is a single scan, not a driver loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a rule factory returns a Column that is TRUE when the row PASSES
RuleFn = Callable[[Column], Column]

_EMAIL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def not_empty(col: Column) -> Column:
    return col.isNotNull() & (F.length(F.trim(col.cast("string"))) > 0)


def min_length(n: int) -> RuleFn:
    return lambda col: F.length(col.cast("string")) >= n


def max_length(n: int) -> RuleFn:
    return lambda col: F.length(col.cast("string")) <= n


def email(col: Column) -> Column:
    return col.cast("string").rlike(_EMAIL_RE)


def in_range(lo: float, hi: float) -> RuleFn:
    return lambda col: col.between(lo, hi)


def one_of(*choices: str) -> RuleFn:
    return lambda col: col.isin(*choices)


def matches(pattern: str) -> RuleFn:
    return lambda col: col.cast("string").rlike(pattern)


@dataclass
class Rule:
    field: str
    check: RuleFn
    message: str
    contexts: tuple[str, ...] = ()  # empty = all contexts (meta.php:44-61)

    def passes(self) -> Column:
        return self.check(F.col(self.field))


class Validator:
    def __init__(self, rules: list[Rule]) -> None:
        self.rules = rules

    def for_context(self, context: str | None = None) -> list[Rule]:
        if context is None:
            return [r for r in self.rules if not r.contexts]
        return [r for r in self.rules if not r.contexts or context in r.contexts]

    def errors_column(self, context: str | None = None) -> Column:
        """Array of failure messages per row (empty array = valid)."""
        # A NULL predicate result counts as failure (coalesce to FALSE).
        parts = [
            F.when(F.coalesce(r.passes(), F.lit(False)), F.lit(None).cast("string"))
            .otherwise(F.lit(r.message))
            for r in self.for_context(context)
        ]
        return F.array_compact(F.array(*parts)) if parts else F.array().cast(
            "array<string>"
        )

    def annotate(self, df: DataFrame, context: str | None = None) -> DataFrame:
        return df.withColumn("_errors", self.errors_column(context)).withColumn(
            "_valid", F.size("_errors") == 0
        )

    def valid_rows(self, df: DataFrame, context: str | None = None) -> DataFrame:
        return self.annotate(df, context).filter(F.col("_valid")).drop(
            "_errors", "_valid"
        )

    def reject_rows(self, df: DataFrame, context: str | None = None) -> DataFrame:
        return self.annotate(df, context).filter(~F.col("_valid"))
