"""Query catalog: the declared operator inventory (SURVEY.md §2).

Every operator the engine claims is registered here as a
:class:`QuerySpec` — a Spark callable ``(spark, sf_dir) -> DataFrame``
plus (where ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
string.  The driver's correctness gate runs both sides at sf=0.01 and
compares row count, schema, and an order-insensitive value hash, so:

- every computed column is aliased identically in Spark and SQL;
- every floating-point aggregate is ``round()``-ed at the same width
  on both sides (sums → 2 decimals, means → 4, ratios/scores → 6) so
  the value hash is insensitive to summation order;
- timestamps are emitted as-is (session TZ pinned to UTC) or cast to
  DATE/STRING when the operator's semantics allow.

Operators whose output is not ANSI-SQL-expressible (approximate
sketches, stateful streaming) register with ``oracle=None`` — the
driver records a weaker rows-only check and pytest covers semantics.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Submodules that register queries on import.
_MODULES = (
    "relational",
    "tpch_ext",
    "windows",
    "setops",
    "scalar",
    "scalar_ext",
    "cdc_batch",
    "streaming_batch",
    "pipeline_queries",
    "udf_queries",
    "dedup_queries",
    "similarity_queries",
    "text_queries",
    "retrieval_queries",
    "corpus_queries",
    "multimodal_queries",
    "layout_queries",
    "graph_queries",
    "dq_queries",
    "ts_queries",
    "funnel_queries",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a query spec under ``name``."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags
        )
        return fn

    return wrap


def load_all() -> dict[str, QuerySpec]:
    """Import every query module and return the full registry."""
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    return dict(_REGISTRY)


def spark_queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in load_all().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }


def release_caches(spark: SparkSession) -> None:
    """Drop every cached table/DataFrame in the session.

    Several queries persist an intermediate (a CollapseProject barrier
    or a multi-branch scan table); the query function cannot unpersist
    it itself — the caller materializes the returned DataFrame AFTER
    the function returns.  Harnesses that run many queries in one
    session (bench.py, tools/driver_sim.py, the driver) call this
    between queries so caches never accumulate across the run and
    identical plans never re-persist ("already cached" warnings)."""
    spark.catalog.clearCache()
