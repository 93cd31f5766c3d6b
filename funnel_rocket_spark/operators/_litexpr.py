"""Single-round-trip literal map/array builders.

``F.create_map(*[F.lit(x) ...])`` costs two py4j round-trips per entry,
so a 1024-entry model map is >1 s of driver socket chatter before any
job runs (measured: text_lm_nll spent 1.3 s of its 2.3 s total building
two literal maps entry-by-entry). Rendering the same literals into ONE
SQL expression string is a single round-trip; the JVM parses it in
milliseconds, and the resulting plan node (a CreateMap/CreateArray over
Literal children) is identical to the per-entry form.

Exactness: ``repr(float)`` emits the shortest decimal that round-trips
to the same IEEE double, and Spark parses ``<decimal>D`` literals with
``Double.parseDouble`` (round-to-nearest) — so every value survives the
text round-trip bit-for-bit. The ``D`` suffix matters: a bare ``0.5``
in Spark SQL is a DECIMAL literal, which would change result types.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sql_str(s: str) -> str:
    """SQL string literal with backslash + quote escaping (Spark's
    default parser processes escape sequences)."""
    return "'" + str(s).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _sql_key(k) -> str:
    if isinstance(k, bool):
        raise TypeError("bool map keys are not supported")
    if isinstance(k, int):
        return str(k)  # int literal — matches F.lit(int)'s IntegerType
    if isinstance(k, str):
        return _sql_str(k)
    raise TypeError(f"unsupported literal key type: {type(k).__name__}")


def _sql_double(v) -> str:
    v = float(v)
    if not math.isfinite(v):
        raise ValueError(f"non-finite literal value: {v!r}")
    return repr(v) + "D"


def lit_double_map(items) -> Column:
    """``map(k0, v0, k1, v1, ...)`` as one SQL expression — keys int or
    str, values double. ``items`` is an iterable of (key, value) pairs;
    must be non-empty (an empty map has no principled key type)."""
    pairs = list(items)
    if not pairs:
        raise ValueError("lit_double_map requires at least one entry")
    return F.expr(
        "map(" + ",".join(f"{_sql_key(k)},{_sql_double(v)}"
                          for k, v in pairs) + ")")


def lit_str_array(items) -> Column:
    """``array('a', 'b', ...)`` as one SQL expression; empty arrays fall
    back to a typed empty array column."""
    vals = list(items)
    if not vals:
        return F.array().cast("array<string>")
    return F.expr("array(" + ",".join(_sql_str(s) for s in vals) + ")")
