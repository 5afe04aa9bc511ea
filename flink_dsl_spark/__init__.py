"""flink_dsl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kduy/Flink-DSL (FSQL streaming SQL dialect
+ batch SQL dialect + Table-API expression strings), re-expressed
Spark-first: parse -> resolve -> emit DataFrame plans -> Catalyst.

See SURVEY.md at the repo root for the full blueprint and reference
citations.
"""

from .bucketing import bucket_spec, write_bucketed
from .engine import FsqlEngine
from .errors import (FsqlError, Failure, Ok, ParseError, PlanError,
                     ResolutionError, UnsupportedError)
from .expressions import XTable, parse_expression, parse_expression_list
from .parser import parse, parse_many
from .session import get_session
from .skew import salted_join

__all__ = [
    "FsqlEngine", "FsqlError", "Failure", "Ok", "ParseError", "PlanError",
    "ResolutionError", "UnsupportedError", "parse", "parse_many",
    "get_session", "XTable", "parse_expression", "parse_expression_list",
    "write_bucketed", "bucket_spec", "salted_join",
]

__version__ = "0.1.0"
