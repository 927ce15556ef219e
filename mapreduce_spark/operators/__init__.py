from mapreduce_spark.operators.mapphase import (
    VIEW_SCHEMA,
    MapSpec,
    build_view,
)

__all__ = ["VIEW_SCHEMA", "MapSpec", "build_view"]
