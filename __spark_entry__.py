"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship exact-cosine-KNN query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (keys are the §2 ids) with matching DuckDB oracle SQL.
Implementation lives in ``tripgogo_vector_search_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tripgogo_vector_search_spark.plans import registry as _registry  # noqa: E402
from tripgogo_vector_search_spark.plans.flagship import flagship_query  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_query(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_registry.ORACLES)
