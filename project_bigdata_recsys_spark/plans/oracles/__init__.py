"""Merged oracle-text registry (one dict across the domain modules).

plans/queries.py binds each entry back into ORACLES at its original
registration site.
"""

from project_bigdata_recsys_spark.plans.oracles import curation as _curation
from project_bigdata_recsys_spark.plans.oracles import dedup as _dedup
from project_bigdata_recsys_spark.plans.oracles import graph as _graph
from project_bigdata_recsys_spark.plans.oracles import ml as _ml
from project_bigdata_recsys_spark.plans.oracles import relational as _relational
from project_bigdata_recsys_spark.plans.oracles import similarity as _similarity
from project_bigdata_recsys_spark.plans.oracles import streaming as _streaming
from project_bigdata_recsys_spark.plans.oracles import text as _text

TEXTS: dict[str, str] = {}
TEXTS.update(_curation.TEXTS)
TEXTS.update(_dedup.TEXTS)
TEXTS.update(_graph.TEXTS)
TEXTS.update(_ml.TEXTS)
TEXTS.update(_relational.TEXTS)
TEXTS.update(_similarity.TEXTS)
TEXTS.update(_streaming.TEXTS)
TEXTS.update(_text.TEXTS)
