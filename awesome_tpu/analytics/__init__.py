from awesome_tpu.analytics.result_model import ResultModel, ResultComparison  # noqa: F401
