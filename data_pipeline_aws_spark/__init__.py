"""data_pipeline_aws_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capability surface of ``bhattsachi/Data-pipeline-aws`` (a declared-but-empty
AWS Glue PySpark ETL skeleton — the Glue job at
``Hoth/FHIR/cloudformations/lambda-stack.yml:11-21`` declares a ``glueetl``
Spark job whose body ``Hoth/FHIR/glue/etl_script.py`` is 0 bytes), extended
with the LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) and designed for 100 TB scale.

Architecture: DataFrame/SQL only, zero custom Catalyst rules. Every operator
is a declarative logical plan that Catalyst+Tungsten optimize (predicate
pushdown, column pruning, AQE, whole-stage codegen). Python touches data only
through Arrow-batched Pandas UDFs, never row-at-a-time in a hot path.
"""

from __future__ import annotations

from data_pipeline_aws_spark.registry import ORACLES, QUERIES

_LOADED = False


def load_all() -> None:
    """Import every query module so its ``@query`` registrations run."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects.
    from data_pipeline_aws_spark.operators import (  # noqa: F401
        aggregates,
        analytic,
        behavior,
        dedup,
        graph,
        joins,
        nested,
        quality,
        relational,
        setops,
        similarity,
        stats,
        timeseries,
        tpch_suite,
        windows,
    )
    from data_pipeline_aws_spark import occ  # noqa: F401
    from data_pipeline_aws_spark.functions import curation, scalar, text  # noqa: F401
    from data_pipeline_aws_spark.multimodal import media  # noqa: F401
    from data_pipeline_aws_spark.sources import ingest  # noqa: F401
    from data_pipeline_aws_spark.streaming import jobs  # noqa: F401
    from data_pipeline_aws_spark.udf import vectorized  # noqa: F401

    _LOADED = True


def all_queries():
    load_all()
    return dict(QUERIES)


def all_oracles():
    load_all()
    return dict(ORACLES)
