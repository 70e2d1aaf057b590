"""PySpark-native analytics engine with the query/data-processing
capabilities of LeandroOrdonez/kafka-streams-pipeline (reference at
/root/reference — a Kafka Streams 2.3 geo-temporal aggregation
pipeline), rebuilt Spark-first.

Core semantics reproduced (SURVEY.md section refs in parentheses):

- ingest of timestamped, geohashed readings (§1.2) into a 1-hour
  tumbling-window materialized view keyed (geohash-cell, window_start)
  with {count, sum, avg} aggregates (§2.3 A1/A2; reference
  ingestion/KafkaStreamsAggregator.java:98-105),
- history queries: time-series of one aggregate over a set of cells
  and a time range (§3.2; reference querying/QueryingService.java:38-122),
- snapshot queries: per-cell aggregates at one instant inside a
  lat/lon bounding box (§3.3; reference
  querying/QueryingService.java:124-203),
- algebraic partial-aggregate merge — avg is always recomputed from
  merged sums/counts, never averaged (§2.3 A3; reference
  querying/util/Aggregator.java:17-30),

plus the driver-mandated LLM-data-pipeline extensions (§2.9): dedup
(exact / normalized / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search, multimodal column plumbing, and
text analysis.

Everything relational is expressed with the DataFrame API so Catalyst
handles pushdown / pruning / join strategy; Python appears only in
driver-side planning helpers (geohash covers) and clearly-marked
stubs — never in the per-row hot path.
"""

__version__ = "0.1.0"

from kafka_streams_pipeline_spark.session import get_spark  # noqa: F401
