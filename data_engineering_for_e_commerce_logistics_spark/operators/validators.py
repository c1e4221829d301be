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
    """Parity with reference ValidationReport (validators.py:44-87)."""

    results: list[RuleResult] = field(default_factory=list)
    table_name: str = ""
    row_count: int = 0

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.results)

    @property
    def error_count(self) -> int:
        """Count of failed validations (ref :64-67)."""
        return sum(1 for r in self.results if not r.passed)

    @property
    def has_critical_failures(self) -> bool:
        return bool(self.critical_failures)

    @property
    def critical_failures(self) -> list[RuleResult]:
        return [
            r
            for r in self.results
            if not r.passed and r.severity == Severity.CRITICAL.value
        ]

    def to_dict(self) -> dict:
        """Report serialization (ref :69-87)."""
        return {
            "table_name": self.table_name,
            "row_count": self.row_count,
            "passed": self.passed,
            "error_count": self.error_count,
            "has_critical_failures": self.has_critical_failures,
            "results": [
                {
                    "rule": r.name,
                    "passed": r.passed,
                    "severity": r.severity,
                    "violations": r.violations,
                    "description": r.description,
                }
                for r in self.results
            ],
        }

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
        # (expected_schema, severity) pairs — checked against df.schema
        # at validate() time, no scan needed (ref validators.py:171-210)
        self._schema_checks: list[tuple[dict[str, str], Severity]] = []

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

    def add_schema_check(
        self,
        expected_schema: dict[str, str],
        severity: Severity = Severity.ERROR,
    ) -> "DataValidator":
        """Column presence + dtype validation (ref :171-210).  Expected
        dtypes are Spark simpleString names ('bigint', 'double',
        'string', 'timestamp', ...).  Plan-level: resolved from
        df.schema with zero data scanned."""
        self._schema_checks.append((dict(expected_schema), severity))
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
        """Run all rules in ONE aggregation job (ref runs N scans);
        schema checks resolve from metadata before any scan."""
        report = ValidationReport(table_name=self.name)
        actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for expected, severity in self._schema_checks:
            mismatches = []
            for col, dtype in expected.items():
                if col not in actual:
                    mismatches.append(f"missing column: {col}")
                elif actual[col] != dtype:
                    mismatches.append(f"{col}: expected {dtype}, got {actual[col]}")
            report.results.append(
                RuleResult(
                    name="schema_check",
                    passed=not mismatches,
                    violations=len(mismatches),
                    total_rows=0,
                    severity=severity.value,
                    description="; ".join(mismatches) or "schema ok",
                )
            )

        if not self._rules:
            report.row_count = df.count() if self._schema_checks else 0
            return report
        row = self.violation_counts(df).first()
        total = row["total_rows"]
        report.row_count = total
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


def create_orders_validator() -> DataValidator:
    """Pre-configured orders validator (ref validators.py:424-432),
    column names per the Olist schema."""
    return (
        DataValidator("orders")
        .add_null_check("order_id", severity=Severity.CRITICAL)
        .add_null_check("customer_id")
        .add_null_check("order_purchase_timestamp")
        .add_unique_check("order_id")
    )


def create_order_items_validator() -> DataValidator:
    """Pre-configured order-items validator (ref validators.py:435-443)."""
    return (
        DataValidator("order_items")
        .add_null_check("order_id", severity=Severity.CRITICAL)
        .add_null_check("product_id")
        .add_range_check("price", min_value=0.0)
        .add_range_check("freight_value", min_value=0.0)
    )
