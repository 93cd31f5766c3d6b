"""Column-level function surface.

The reference's entire scalar surface is the comparison operators plus literal
``contains`` (``/root/reference/frocket/common/validation/consts.py:51-65``,
SURVEY §2.9); here that surface is :func:`filter_to_column` plus the reusable
vector/text Column helpers the extension operators are built from. Everything
is a pure JVM expression — usable in any DataFrame program, no UDFs.
"""

from funnel_rocket_spark.operators.dedup import (
    minhash_signature,
    simhash16,
    tokens,
    word_ngrams,
)
from funnel_rocket_spark.operators.similarity import cosine, dot, norm
from funnel_rocket_spark.operators.text import bpe_token_estimate, token_count
from funnel_rocket_spark.planner.compiler import (
    filter_to_column,
    filters_to_column,
    ts_numeric,
)

__all__ = [
    "filter_to_column", "filters_to_column", "ts_numeric",
    "dot", "norm", "cosine",
    "tokens", "word_ngrams", "token_count", "bpe_token_estimate",
    "minhash_signature", "simhash16",
]
