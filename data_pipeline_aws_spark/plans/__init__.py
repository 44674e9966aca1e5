from data_pipeline_aws_spark.plans.inspect import executed_plan, plan_has, read_schema

__all__ = ["executed_plan", "plan_has", "read_schema"]
