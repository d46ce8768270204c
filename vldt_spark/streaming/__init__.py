from vldt_spark.streaming.validate_stream import (
    validated_stream,
    stream_verdicts,
    windowed_violation_counts,
)

__all__ = ["validated_stream", "stream_verdicts", "windowed_violation_counts"]
