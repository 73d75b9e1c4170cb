"""fastpasta_spark — a from-scratch PySpark-native validation engine.

Plays the role of CramBL/fastPASTA (`/root/reference`): per-record
pass/fail verdicts, a violation report with stable error codes,
aggregate stat totals, and golden-stats regression — rebuilt as a
schema + constraint validator over tables of interleaved text+media
documents, expressed Spark-first (DataFrame API + Catalyst, vectorized
Arrow/pandas UDFs only where built-ins cannot express the semantics).

Package layout:
  schema      — declared StructTypes, span-kind alphabet, error codes
  session     — SparkSession builder tuned for the validation workload
  sources     — synthetic corpus generator + testdata loaders + connectors
  functions   — reusable Column-expression helpers + pure-Python FSM oracle
  operators   — the check battery (sanity, sequence, uniqueness,
                referential, drift, dedup, similarity, text stats)
  plans       — end-to-end pipelines (check_all, report, lineage/resume)
  streaming   — Structured Streaming validation entry points
"""

__version__ = "0.1.0"
