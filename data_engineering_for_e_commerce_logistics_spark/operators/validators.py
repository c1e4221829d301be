"""Data-quality rule engine — SURVEY §2.9 + §4.3.

Reference: src/transform/validators.py — a builder API
(add_null_check :140-168, add_type_check :186-210, add_unique_check
:228-257, add_range_check :279-319, add_business_rule :322-376) whose
checks each scan the pandas frame separately, collected into a
ValidationReport (:34-87) with severity levels and a critical-failure
gate (main.py:112-117).

Spark-first redesign: every rule compiles to aggregate *expressions*
fused into ONE df.agg(...) pass (SURVEY §4.3) — a single scan + one
partial/final aggregation regardless of rule count, instead of the
reference's N scans.  Null semantics: a rule predicate evaluating to
null counts as a violation, matching pandas' ~mask coercion
(SURVEY §7.4.2).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Severity(str, Enum):
    WARNING = "warning"
    ERROR = "error"
    CRITICAL = "critical"


@dataclass(frozen=True)
class Rule:
    """One compiled rule: a violation-count aggregate + metadata."""

    name: str
    violation_count: Column  # aggregate expression counting violations
    severity: Severity = Severity.ERROR
    threshold: float = 0.0  # allowed violation fraction (null checks)
    description: str = ""


@dataclass
class RuleResult:
    name: str
    passed: bool
    violations: int
    total_rows: int
    severity: str
    description: str = ""


@dataclass
class ValidationReport:
    """Parity with reference ValidationReport (validators.py:34-87)."""

    results: list[RuleResult] = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.results)

    @property
    def critical_failures(self) -> list[RuleResult]:
        return [
            r
            for r in self.results
            if not r.passed and r.severity == Severity.CRITICAL.value
        ]

    def raise_on_critical(self) -> None:
        """The pipeline abort gate (ref main.py:112-117)."""
        bad = self.critical_failures
        if bad:
            names = ", ".join(r.name for r in bad)
            raise ValueError(f"critical validation failure(s): {names}")


def _violation(pred: Column) -> Column:
    """Count rows where the *pass* predicate is false OR null (pandas
    ~mask counts NaN comparisons as violations)."""
    return F.count(F.when(~F.coalesce(pred, F.lit(False)), F.lit(1)))


class DataValidator:
    """Builder API mirroring the reference's, compiling to one agg pass."""

    def __init__(self, name: str = "validator"):
        self.name = name
        self._rules: list[Rule] = []

    # --- builders (ref validators.py:121-376) --------------------------

    def add_null_check(
        self,
        column: str,
        threshold: float = 0.0,
        severity: Severity = Severity.ERROR,
    ) -> "DataValidator":
        """Fail when null fraction of ``column`` exceeds threshold."""
        self._rules.append(
            Rule(
                name=f"null_check_{column}",
                violation_count=F.count(F.when(F.col(column).isNull(), F.lit(1))),
                severity=severity,
                threshold=threshold,
                description=f"null fraction of {column} <= {threshold}",
            )
        )
        return self

    def add_unique_check(
        self,
        columns: list[str] | str,
        severity: Severity = Severity.ERROR,
    ) -> "DataValidator":
        """Fail when the (composite) key has duplicate rows.  Compiled
        as count(*) - count(distinct key) — stays in the same agg pass."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        # struct wrap: countDistinct(col) skips NULLs, but pandas
        # duplicated() treats NaN==NaN — a (NULL,) struct is non-null,
        # so NULL keys participate in distinctness like values.
        key = F.struct(*cols)
        self._rules.append(
            Rule(
                name=f"unique_check_{'_'.join(cols)}",
                violation_count=F.count(F.lit(1)) - F.countDistinct(key),
                severity=severity,
                description=f"{cols} unique",
            )
        )
        return self

    def add_range_check(
        self,
        column: str,
        min_value: float | None = None,
        max_value: float | None = None,
        severity: Severity = Severity.ERROR,
    ) -> "DataValidator":
        pred = F.lit(True)
        if min_value is not None:
            pred = pred & (F.col(column) >= F.lit(min_value))
        if max_value is not None:
            pred = pred & (F.col(column) <= F.lit(max_value))
        # null values are not range violations (pandas comparisons on
        # NaN are False → ~False=True counts them; the reference's
        # range check uses explicit < / > sums which skip NaN, so nulls
        # pass here: only definite out-of-range rows count).
        violation = F.count(
            F.when(F.col(column).isNotNull() & ~pred, F.lit(1))
        )
        self._rules.append(
            Rule(
                name=f"range_check_{column}",
                violation_count=violation,
                severity=severity,
                description=f"{column} in [{min_value}, {max_value}]",
            )
        )
        return self

    def add_allowed_values(
        self,
        column: str,
        allowed: list,
        severity: Severity = Severity.ERROR,
    ) -> "DataValidator":
        self._rules.append(
            Rule(
                name=f"allowed_values_{column}",
                violation_count=_violation(F.col(column).isin(allowed)),
                severity=severity,
                description=f"{column} in {allowed}",
            )
        )
        return self

    def add_business_rule(
        self,
        name: str,
        predicate: Column,
        severity: Severity = Severity.ERROR,
        description: str = "",
    ) -> "DataValidator":
        """Boolean pass-predicate over columns (ref :322-376); null
        results count as violations (pandas ~mask parity)."""
        self._rules.append(
            Rule(
                name=name,
                violation_count=_violation(predicate),
                severity=severity,
                description=description,
            )
        )
        return self

    # --- compile + run --------------------------------------------------

    def violation_counts(self, df: DataFrame) -> DataFrame:
        """The fused single-pass plan: one row, one column per rule.
        Exposed separately so the oracle harness can diff it."""
        aggs = [F.count(F.lit(1)).alias("total_rows")] + [
            r.violation_count.cast("long").alias(r.name) for r in self._rules
        ]
        return df.agg(*aggs)

    def validate(self, df: DataFrame) -> ValidationReport:
        """Run all rules in ONE aggregation job (ref runs N scans)."""
        row = self.violation_counts(df).first()
        total = row["total_rows"]
        report = ValidationReport()
        for r in self._rules:
            violations = int(row[r.name])
            allowed = r.threshold * total
            report.results.append(
                RuleResult(
                    name=r.name,
                    passed=violations <= allowed,
                    violations=violations,
                    total_rows=total,
                    severity=r.severity.value,
                    description=r.description,
                )
            )
        return report
