from funnel_rocket_spark.validation.validator import (
    QueryValidationError,
    expand_and_validate,
)
from funnel_rocket_spark.validation.relation import parse_relation

__all__ = ["QueryValidationError", "expand_and_validate", "parse_relation"]
