"""Plan inspection: the engine's ::explain surface and plan-quality checks."""

from cozo_spark.plans.inspect import explain_summary, plan_properties  # noqa: F401
