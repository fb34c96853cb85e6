"""kglids_spark — a from-scratch PySpark-native schema + constraint
validation and data-discovery engine with the query capabilities of
CoDS-GCS/kglids (reference at /root/reference, read-only).

The reference profiles data lakes with per-column pandas workers
(kg_governor/data_profiling/profile_data.py:89-135) and answers
discovery queries via SPARQL/pgvector. This engine re-expresses the
same capabilities Spark-first:

- single-pass columnar profiling (operators/profiler.py)
- constraint validation with mergeable sketches, resumable from a
  checkpoint ledger (operators/validate.py, operators/constraints.py)
- distribution-drift detection (operators/drift.py)
- column-similarity joins + top-k discovery (operators/similarity.py)
- dedup / ANN / text-analysis pipeline ops (operators/dedup.py,
  operators/ann.py, operators/text.py)

Everything is DataFrame-declarative so Catalyst/AQE pick physical
strategies; Python only appears in Arrow-vectorized UDFs.
"""

__version__ = "0.1.0"
