from flusher_spark.functions.a1 import (
    A1Range,
    col_letters,
    col_number,
    num_columns_from_range,
    parse_a1_range,
)
from flusher_spark.functions.intervals import from_human

__all__ = [
    "A1Range",
    "col_letters",
    "col_number",
    "num_columns_from_range",
    "parse_a1_range",
    "from_human",
]
