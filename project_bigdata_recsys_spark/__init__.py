"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference system ``hoigreen/project-bigdata-recsys``.

The reference (surveyed in /root/repo/SURVEY.md) is a MOOC recommendation
pipeline whose relational work is delegated to PostgreSQL, pandas and one
PySpark ALS job.  This package re-expresses that entire operator surface —
scans, filters, joins, aggregations, window functions, top-K, set ops,
scalar functions, the ML pipeline, and the streaming consumer — as a single
idiomatic PySpark engine (DataFrame / Spark SQL / Structured Streaming),
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) the reference lacks.

Everything is built on public Apache Spark APIs only.
"""

from project_bigdata_recsys_spark.session import get_spark
from project_bigdata_recsys_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_spark", "TABLES", "load_tables", "register_views"]

__version__ = "0.1.0"
