"""ai_iceberg_demo_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the reference
application ``temporal-community/ai-iceberg-demo`` (a Temporal-orchestrated
deep-research app over Neo4j + Redpanda + OpenAI) as an idiomatic Spark
engine:

- the property-graph store (conversations/messages/results) becomes
  DataFrames over parquet/Iceberg tables with equi-join traversals and
  window-function sequence chains,
- the vector/RAG layer becomes an ``ArrayType(FloatType())`` embedding
  column with exact cosine top-k and LSH/bucketed approximate paths,
- the Redpanda event stream becomes Structured Streaming with
  ``to_json``/``from_json`` envelopes and per-row topic routing,
- the durable workflow dataflow becomes composable DataFrame pipelines
  (explode → per-row transform → collect_list fan-in) plus keyed
  stateful streaming.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, and AQE handles runtime re-planning; Python
UDFs appear only behind Arrow-vectorized seams (pandas_udf /
applyInPandas / mapInPandas) where built-ins genuinely can't express
the semantics.

Designed for 100 TB scale: every operator documents its partitioning
and shuffle behavior; small dimensions broadcast; similarity search has
an exact path (correctness) and a bucketed/LSH path (scale).
"""

from ai_iceberg_demo_spark.session import get_spark
from ai_iceberg_demo_spark.tables import TABLE_NAMES, load_table, register_tables

__all__ = ["get_spark", "register_tables", "load_table", "TABLE_NAMES"]

__version__ = "0.1.0"
