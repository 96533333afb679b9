"""CAWD-Spark: a PySpark-native engine with the query/data-processing
capabilities of castuardo/columnar-aware-dedup, re-designed Spark-first.

Importing this package populates the query registry (``registry.QUERIES`` /
``registry.ORACLES``) that ``__spark_entry__.py`` exposes to the driver.
"""

from __future__ import annotations

from columnar_aware_dedup_spark import registry  # noqa: F401
from columnar_aware_dedup_spark.operators import dedup  # noqa: F401
from columnar_aware_dedup_spark.operators import events  # noqa: F401
from columnar_aware_dedup_spark.operators import relational  # noqa: F401
from columnar_aware_dedup_spark.operators import relational_ext  # noqa: F401
from columnar_aware_dedup_spark.operators import relational_fns  # noqa: F401
from columnar_aware_dedup_spark.operators import macro  # noqa: F401
from columnar_aware_dedup_spark.operators import scale  # noqa: F401
from columnar_aware_dedup_spark.operators import udf  # noqa: F401
from columnar_aware_dedup_spark.operators import similarity  # noqa: F401
from columnar_aware_dedup_spark.operators import stats  # noqa: F401
from columnar_aware_dedup_spark.operators import taxonomy  # noqa: F401
from columnar_aware_dedup_spark.operators import multimodal  # noqa: F401
from columnar_aware_dedup_spark.operators import text  # noqa: F401
from columnar_aware_dedup_spark.sources import binaryfile  # noqa: F401
from columnar_aware_dedup_spark.sources import chunkers  # noqa: F401

__all__ = ["registry"]
