"""Query-catalog registry: one ``QuerySpec`` per implemented OP-ID.

Each spec bundles the Spark implementation with its DuckDB oracle SQL
(None for genuinely non-SQL-expressible ops → driver does rows-only).
``__spark_entry__.py`` derives ``queries()`` / ``oracle_sql()`` from
this registry, and ``tests/test_oracle_parity.py`` replicates the
driver's compare locally so mismatches are caught pre-round.

Contract reminders (driver compare):
- column names must match between Spark result and oracle SQL — alias
  everything on both sides;
- compare sorts columns by name and hashes values order-insensitively
  → every query must be deterministic (tie-free ORDER BY before any
  LIMIT, rounded floats after aggregation).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# An oracle is a DuckDB SQL string, or a ZERO-ARG CALLABLE returning
# one — used when the SQL must embed corpus-derived literals (e.g.
# ann_pca_project's quantized eigenvectors, which depend on the SF).
# Callables read SPARK_GRAFT_ORACLE_SF_DIR (default the driver's
# sf0.01) and are resolved at oracle_sql() time, after the gate has
# pinned the env var to its --sf.

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | Callable[[], str] | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def resolve_oracle(oracle: str | Callable[[], str] | None) -> str | None:
    """A lazy oracle resolves to its SQL; strings/None pass through."""
    return oracle() if callable(oracle) else oracle


def register(
    name: str,
    oracle: str | Callable[[], str] | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the catalog under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def _load_all_modules() -> None:
    # Import side-effect registers specs; keep imports here to avoid
    # circularity at package import time.
    from pdf_etl_ocr_inference_spark.plans import (  # noqa: F401
        analysis_plans,
        clustering_plans,
        dedup_plans,
        document_plans,
        events_plans,
        multimodal_plans,
        pandas_plans,
        relational_plans,
        scale_plans,
        setop_plans,
        similarity_plans,
        sketch_plans,
        source_plans,
        streaming_plans,
        temporal_plans,
        text_plans,
        tpch2_plans,
        tpch_plans,
        train_plans,
    )


def all_specs() -> dict[str, QuerySpec]:
    _load_all_modules()
    return dict(_REGISTRY)


def query_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_map() -> dict[str, str]:
    return {
        name: resolve_oracle(spec.oracle)
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
