"""Plan inspection utilities — the engine's plan-hygiene toolkit."""

from rlr_spark.plans.inspect import (  # noqa: F401
    has_python_udf,
    physical_plan,
    pushed_filters,
    read_schemas,
)
