from f1_data_pipeline_spark.functions.scalars import (
    bool_parse,
    int_coerce,
    lap_time_seconds,
    numeric_coerce,
    parse_event_time,
    strip_quotes,
)

__all__ = [
    "bool_parse",
    "int_coerce",
    "lap_time_seconds",
    "numeric_coerce",
    "parse_event_time",
    "strip_quotes",
]
