"""arkhammirror_spark — a PySpark-native document-intelligence extraction engine.

A from-scratch rebuild of the extraction core of mantisfury/ArkhamMirror
("SHATTERED") over Spark DataFrames: batched HTML boilerplate stripping, text
normalization, per-document entity/date/relation span extraction, chunking,
and a knowledge-graph co-mention edge table — plus large-scale training-data
operators (dedup, similarity search, text analysis).

Layout:
- ``reference_impl/``: pure-Python oracle functions whose outputs are
  byte-identical to the reference's deterministic extractors (the parity
  anchors). These run *inside* pandas UDFs so Spark output == oracle output
  by construction.
- ``operators/``: Spark DataFrame operators (native expressions first,
  Arrow-batched pandas UDFs where unavoidable).
- ``datagen/``: deterministic synthetic `pages` table generator (seeded).
- ``pipeline.py``: the end-to-end extraction DAG with partitioning, skew
  salting, audit/lineage, and snapshot-checkpoint resume.
"""

__version__ = "0.1.0"
