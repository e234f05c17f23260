from zenodb_spark.functions.measures import (  # noqa: F401
    IF,
    BOUNDED,
    wavg,
    safe_div,
    exact_sum,
    exact_avg,
    points,
)
from zenodb_spark.functions.dims import DIM_FUNCTIONS, register_dim_function  # noqa: F401
