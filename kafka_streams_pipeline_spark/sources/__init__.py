from kafka_streams_pipeline_spark.sources.tables import load_tables, register_views  # noqa: F401
from kafka_streams_pipeline_spark.sources.readings import (  # noqa: F401
    decode_json_readings,
    kafka_reading_stream,
    readings_from_events,
    with_event_time,
)
