"""joblink_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference ETL pipeline
(hkonjeti3/joblink-etl, surveyed in SURVEY.md) as idiomatic PySpark:
declarative DataFrame plans, Catalyst-optimizable column expressions,
tiered-subset execution for expensive external calls, and
large-scale LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) designed for 100 TB workloads.
"""

__version__ = "0.1.0"
