from vrod_spark.plans.inspect import explain_str, plan_has

__all__ = ["explain_str", "plan_has"]
