"""flink_audit_sessions_example_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (WillDyson/flink-audit-sessions-example — a Flink streaming job
that sessionizes Ranger audit logs by user and counts denied events per
session), re-expressed Spark-first:

- every operator is a pure ``DataFrame -> DataFrame`` transform that works
  identically under ``spark.read`` (batch) and ``spark.readStream``
  (Structured Streaming);
- declarative logical plans only — Catalyst plans the physical execution
  (partial aggregation, shuffle placement, predicate pushdown, whole-stage
  codegen); no RDDs and no row-at-a-time Python in the hot path;
- designed for 100 TB scale: partition-pruned sources, broadcast joins for
  dimension tables, LSH (not cross-joins) for near-dedup / similarity.

Package layout:

- :mod:`.schemas`    — typed record schemas (Audit, result shapes)
- :mod:`.config`     — Java-properties config loader (reference parity)
- :mod:`.sources`    — file/JSON-lines sources with date pruning
- :mod:`.operators`  — sessionization, dedup, similarity, text, relational
- :mod:`.functions`  — scalar helpers (formatting, hashing)
- :mod:`.streaming`  — streaming pipeline assembly + sinks
- :mod:`.plans`      — the query registry exported via ``__spark_entry__``
"""

__version__ = "0.1.0"
