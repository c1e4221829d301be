"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers a QuerySpec:
a (spark, sf_dir) -> DataFrame builder plus the equivalent ANSI SQL a
DuckDB oracle can run over the same parquet tables.  ``__spark_entry__``
re-exports this registry as ``queries()`` / ``oracle_sql()``; the
pytest differential harness runs the same pairs at sf0.001.

Specs with ``oracle=None`` are genuinely non-SQL-expressible (custom
stateful streaming, iterative algorithms) and get the driver's weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, build: Builder, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query spec: {name}")
    _REGISTRY[name] = QuerySpec(name, build, oracle, tags)


def all_specs() -> dict[str, QuerySpec]:
    """Import every module that registers specs, then return the registry."""
    # Local imports: registration happens at module import time; keeping
    # them here avoids import cycles with operator modules.
    from . import queries as _queries  # noqa: F401

    return dict(_REGISTRY)
