"""apache_iceberg_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference "zero-cost data lakehouse" (senthilsweb/apache-iceberg): a CSV →
table ingestion pipeline, a pluggable catalog/DDL surface, the full SQL
analytics surface its notebooks exercise, plus large-scale training-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis) designed for 100 TB scale.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Arrow-vectorized Python only where built-ins cannot express the
semantics.
"""

from apache_iceberg_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
