"""PySpark-native analytics engine with the query and data-processing
capabilities of hwong511/yelp-streaming-etl-pipeline.

Architecture (Spark-first, not a port):

- ``functions/``   pure-``Column`` expression library: text features,
  validation predicates, quality scores, language ID. Everything the
  reference computes row-at-a-time in Python becomes a declarative
  expression that Catalyst optimizes and Tungsten codegens.
- ``operators/``   composite DataFrame transformations: the validation
  gauntlet (clean/route/issues), windowed stats, dedup family
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search, relational query library, multimodal plumbing.
- ``sources/``     readers and sinks: JSON-lines review source with the
  reference's lenient schema mapping, Kafka source/sink wrappers, JDBC
  idempotent-upsert sink.
- ``streaming/``   Structured Streaming topology mirroring the
  reference's Faust app: watermark dedup -> quality gauntlet ->
  accepted/issues routing -> windowed stats.
- ``plans/``       plan-inspection helpers (explain audits used by
  tests to assert pushdown / broadcast / codegen).

Reference parity is documented per-function with file:line citations
into /root/reference (studied for behavior only; no code copied).
"""

__version__ = "0.1.0"
