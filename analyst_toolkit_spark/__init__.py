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


def toolkit(spark=None, **kwargs):
    """Convenience entry: a ready Toolkit (tool-call surface over a session
    store) on the default SparkSession."""
    from analyst_toolkit_spark.tools import Toolkit

    return Toolkit(spark or get_spark(), **kwargs)


def run_pipeline_from_yaml(config_path: str, spark=None, df=None):
    """Convenience entry: run the full module chain from a master YAML."""
    from analyst_toolkit_spark.plans import config as C
    from analyst_toolkit_spark.plans.pipeline import run_pipeline

    return run_pipeline(spark or get_spark(), C.pipeline_config(C.load_yaml(config_path)), df)
