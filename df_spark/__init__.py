"""df_spark — a PySpark-native analytics engine with the query surface
of the reference columnar DataFrame library (angelini/df), rebuilt
Spark-first: DataFrame/SQL logical plans, Catalyst/Tungsten execution,
Structured Streaming for streams, Pandas UDFs only where built-ins
can't express the semantics.
"""

from .expr import (
    Aggregator,
    ArithmeticOp,
    Comparator,
    EngineError,
    Expr,
    Predicate,
    Value,
    c,
    raw,
    v,
)
from .frame import Df
from .session import get_spark

__all__ = [
    "Aggregator",
    "ArithmeticOp",
    "Comparator",
    "Df",
    "EngineError",
    "Expr",
    "Predicate",
    "Value",
    "c",
    "get_spark",
    "raw",
    "v",
]
