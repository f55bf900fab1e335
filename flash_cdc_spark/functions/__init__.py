"""Pure Column-expression helpers (JVM-side, whole-stage-codegen friendly).

Nothing in this package uses a Python UDF: every helper composes
``pyspark.sql.functions`` so Catalyst can fold, push down, and codegen it.
"""

from flash_cdc_spark.functions.normalize import (
    mask_secret,
    normalize_commit_ms,
    truthy_flag,
)
from flash_cdc_spark.functions.urls import canonicalize_url

__all__ = ["normalize_commit_ms", "truthy_flag", "mask_secret", "canonicalize_url"]
