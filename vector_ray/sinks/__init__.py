from vector_ray.sinks.parquet import ParquetSink, write_partitioned

__all__ = ["ParquetSink", "write_partitioned"]
