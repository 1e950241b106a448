"""analyst_toolkit_spark — a PySpark-native data QA / cleaning / analytics engine.

Re-expresses the capabilities of ``G-Schumacher44/analyst_toolkit`` (a pandas,
single-node, config-driven QA pipeline) as idiomatic, lazily-planned Spark
DataFrame operators, designed for 100 TB scale:

- ``operators/``  — the module surface (profile, validate, normalize, duplicates,
  outliers, impute, final audit, diff, drift) as pure DataFrame -> DataFrame /
  report-dict producers.
- ``functions/``  — expression-level building blocks (pandas-parity statistics,
  exact percentiles, mode tie-breaks).
- ``llm/``        — large-scale training-data-pipeline operators beyond the
  reference surface: dedup (exact / MinHash-LSH / SimHash), similarity search,
  text analysis, multimodal column plumbing.
- ``streaming/``  — Structured Streaming re-expression of the rule engine.
- ``pipeline.py`` — the end-to-end module chain (reference run_toolkit_pipeline).

Everything is built on the public Apache Spark DataFrame/SQL API; Catalyst does
planning/pushdown/codegen, AQE handles shuffle sizing and skew.
"""

__version__ = "0.1.0"

from analyst_toolkit_spark.session import get_spark  # noqa: F401
