"""metas_judiciarias_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference ETL (Laraewellen/metas-judiciarias-etl): the
CNJ "Metas Nacionais" judicial-target pipeline (grouped sums, guarded ratio
kernels, dimension lookup with fallback, schema-drift-tolerant union, wide-row
assembly, ordered CSV sinks), plus a generic relational operator surface and
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal column plumbing).

Everything is expressed against the public PySpark DataFrame/SQL API so that
Catalyst/Tungsten pick the physical strategy; no RDDs, and Python UDFs only
where built-ins genuinely cannot express the semantics (Arrow-batched).
"""

__version__ = "0.1.0"
