"""Plan inspection utilities — the engine's plan-hygiene toolkit."""

from rlr_spark.plans.inspect import (  # noqa: F401
    count_jobs,
    has_python_udf,
    has_shuffle_lineage,
    physical_plan,
    pushed_filters,
    read_schemas,
)
