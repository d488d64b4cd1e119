"""rex_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the data semantics of Spico197/REx
(relation extraction / NER / joint extraction toolkit) as Spark
DataFrame operators, plus the surrounding web-scale pipeline the
north star requires: Common-Crawl-style page tables -> clean text ->
mention detection -> candidate pairs -> (subj, pred, obj) triples ->
entity canonicalization -> partitioned entity/edge tables, with
resumable stage checkpoints and per-partition lineage.

Layout
------
- ``rex_spark.kernels``    pure-Python deterministic kernels (no Spark
  imports).  Each kernel is the single source of truth for one
  transform; the *same function* runs in-process (the oracle path)
  and inside Arrow-batched pandas UDFs (the distributed path), which
  is what makes the byte-identical / P-R contracts hold.
- ``rex_spark.operators``  ``DataFrame -> DataFrame`` stages built on
  the kernels and on built-in pyspark.sql functions.
- ``rex_spark.io``         sources/sinks + the resumable StageStore.
- ``rex_spark.pipeline``   end-to-end KG construction DAG.
- ``rex_spark.streaming``  optional incremental ingest (Structured
  Streaming ``foreachBatch`` over the same batch operators).
"""

__version__ = "0.1.0"
