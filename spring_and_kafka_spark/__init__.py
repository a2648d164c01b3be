"""spring_and_kafka_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference (joshlong-attic/spring-and-kafka — a Spring Integration + Kafka
message-pipeline demo), re-expressed Spark-first:

- batch relational surface: DataFrame/SQL over Parquet (Catalyst-optimized)
- streaming surface: Structured Streaming with a Kafka source/sink contract
  mirroring the reference (topic ``event-stream``, earliest offsets, rate
  caps, processing-time triggers ≈ the reference's pollers)
- LLM-data-pipeline operators: dedup (exact/MinHash/SimHash/n-gram/embedding),
  similarity search, text analysis, multimodal column conventions

Every operator is registered in :mod:`spring_and_kafka_spark.registry` and
surfaced through ``__spark_entry__.py`` for the driver's DuckDB-oracle
correctness gate.
"""

from spring_and_kafka_spark.session import get_spark
from spring_and_kafka_spark.sources.tables import TABLES, load_table, load_tables

__all__ = ["get_spark", "TABLES", "load_table", "load_tables"]
