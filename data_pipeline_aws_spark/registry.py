"""Query registry: name → (spark, sf_dir) -> DataFrame, plus DuckDB oracle SQL.

Every operator the engine implements registers here; the driver contract
(``__spark_entry__.queries()`` / ``oracle_sql()``) is a thin view over these
dicts. An operator without oracle SQL (genuinely non-SQL-expressible, e.g.
approximate sketches or streaming smoke) registers with ``oracle=None`` and
gets the driver's weaker rows-only check — keep those a small minority.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle SQL twin.

    Column names of the Spark result and the oracle SQL must match exactly —
    the driver sorts columns by name before value-hashing, so alias every
    computed column identically on both sides.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
