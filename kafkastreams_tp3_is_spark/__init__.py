"""PySpark-native analytics engine with the query surface of
Dany99486/KafkaStreams-TP3_IS (urban-mobility continuous queries Q1-Q13),
re-expressed Spark-first, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Layers (SURVEY.md section 7):
  - core relational: schemas, derived routes/trips views, shared base aggs
  - query layer: Q1-Q13 as (spark, sf_dir) -> DataFrame, with ANSI-SQL oracles
  - streaming/IO: Kafka wrappers, Connect-envelope writer, JDBC upsert sink,
    foreachBatch recompute harness, synthetic generators
"""

__version__ = "0.1.0"
