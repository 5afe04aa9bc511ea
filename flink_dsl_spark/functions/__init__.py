"""Function registry.

Parity target: the reference classifies aggregate-vs-scalar by name lookup
(flinkdsl/typer.scala_:272-282), types abs/lower/upper (":284-287") and
bitwise ops (":288-292"), and exposes extension hook maps
``extraAggregateFunctions`` / ``extraScalarFunctions``
(flinkdsl/typer.scala_:297-298).  Unknown function names are legal and
type as Any (":321-331").

Spark mapping: a dict name -> Column-builder; unknown names fall through
to ``F.call_function`` so EVERY Spark builtin is available (a strict
superset, as planned in SURVEY.md §2.10).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# names the engine treats as aggregates (flinkdsl/typer.scala_:276-282
# lists avg/count/min/max/sum; the rest are Spark-superset aggregates)
AGGREGATE_NAMES = {
    "avg", "count", "min", "max", "sum", "mean",
    "stddev", "stddev_pop", "stddev_samp", "variance", "var_pop",
    "var_samp", "first", "last", "collect_list", "collect_set",
    "approx_count_distinct", "percentile_approx", "median", "mode",
    "skewness", "kurtosis", "corr", "covar_pop", "covar_samp",
    "count_if", "bool_and", "bool_or", "any_value",
}


def is_aggregate(name: str) -> bool:
    """isAggregate parity (flinkdsl/typer.scala_:272)."""
    return name.lower() in AGGREGATE_NAMES


class FunctionRegistry:
    """name -> builder(args: list[Column]) -> Column, with Spark-builtin
    fallthrough.  ``register`` is the extraScalarFunctions /
    extraAggregateFunctions extension hook."""

    def __init__(self):
        self._fns: dict[str, Callable[..., Column]] = {}
        self._agg_names: set[str] = set(AGGREGATE_NAMES)
        self._install_builtins()

    def register(self, name: str, fn: Callable[..., Column],
                 aggregate: bool = False) -> None:
        self._fns[name.lower()] = fn
        if aggregate:
            self._agg_names.add(name.lower())

    def is_aggregate(self, name: str) -> bool:
        return name.lower() in self._agg_names

    def build(self, name: str, args: list[Column]) -> Column:
        fn = self._fns.get(name.lower())
        if fn is not None:
            return fn(*args)
        # fallthrough: any Spark SQL builtin (superset by design)
        return F.call_function(name, *args)

    def _install_builtins(self):
        """The reference's typed builtins (flinkdsl/typer.scala_:277-292)
        plus the distinct-agg variants (flinkdsl/parser.scala:201)."""
        r = self.register
        r("avg", F.avg, aggregate=True)
        r("count", F.count, aggregate=True)
        r("min", F.min, aggregate=True)
        r("max", F.max, aggregate=True)
        r("sum", F.sum, aggregate=True)
        r("abs", F.abs)
        r("lower", F.lower)
        r("upper", F.upper)
        # distinct-arg aggregate variants; the general case is handled in
        # the planner via F.expr("<agg>(DISTINCT __a<i>)") over pre-projected
        # argument columns (flinkdsl/parser.scala:201)
        r("count_distinct", F.countDistinct, aggregate=True)
        r("sum_distinct", F.sum_distinct, aggregate=True)


# module-level default registry (engine instances may clone/extend)
DEFAULT_REGISTRY = FunctionRegistry()
