"""Custom + composed operators over DataFrames."""

from demy_spark.operators.topk import (  # noqa: F401
    top_k_per_group,
    latest_wins,
    add_id,
)
from demy_spark.operators.groupby import group_by_reduce  # noqa: F401
