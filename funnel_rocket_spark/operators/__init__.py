"""Large-scale training-data pipeline operators, beyond the reference's scope.

All hot paths are JVM-side Column expressions (md5 / split / explode /
higher-order array functions) — no Python UDFs except the clearly-marked
multimodal decode plumbing, which is Arrow-batched ``mapInPandas``.
"""

from funnel_rocket_spark.operators import (
    behavior,
    dedup,
    multimodal,
    similarity,
    skew,
    text,
)

__all__ = ["behavior", "dedup", "multimodal", "similarity", "skew", "text"]
