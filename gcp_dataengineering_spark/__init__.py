"""gcp_dataengineering_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query/data-processing
capabilities of the reference repo ``snaveenk1449/GCP_DataEngineering``
(an AWS Glue PySpark batch ETL job), re-expressed Spark-first:

- DataFrame/SQL logical plans, Catalyst/Tungsten physical execution
- table registry instead of Glue catalog / Athena metadata / crawler
- parquet snapshot + versioned-history sinks
- the reference's signature analytic pattern: vintage-snapshot union →
  conform → dim join → proportional cost allocation (window or
  grouped-total-join form) → typed aggregation
- beyond-reference LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal plumbing), designed for 100 TB
  scale.

See SURVEY.md for the full blueprint and the reference file:line
citations embedded in docstrings throughout.
"""

__version__ = "0.1.0"
