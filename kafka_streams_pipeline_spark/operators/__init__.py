from kafka_streams_pipeline_spark.operators.view import build_view  # noqa: F401
from kafka_streams_pipeline_spark.operators.queries import (  # noqa: F401
    history,
    history_interval,
    merge_views,
    reaggregate_precision,
    snapshot,
)
