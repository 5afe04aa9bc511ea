"""Start-of-round testdata pre-flight: fail LOUDLY, by column name, when
the driver-regenerated parquet under /root/testdata changes physical
encoding, instead of surfacing the drift later as inscrutable oracle
mismatches.

Motivation: the driver has silently flipped `events.ts` twice already
(TIMESTAMP(NANOS) in rounds 1-2, no-tz micros that load as
TIMESTAMP_NTZ from round 3).  The engine normalizes every encoding it
KNOWS (`engine._restore_nano_timestamps`, `engine._coerce_ntz`,
`tests/test_timestamp_encodings.py`); this sentinel is the tripwire for
the one it doesn't yet.  It runs on pyarrow footers only — no Spark
session, so bench.py and conftest can call it before any JVM spins up.
"""

from __future__ import annotations

import os

#: column -> type family the engine + oracles were validated against.
#: Families are deliberately broad (any int width is "int"): the
#: sentinel flags *kind* changes (timestamp->int64, double->decimal,
#: string->large_string is fine) that need a new normalization arm,
#: not benign width changes Catalyst absorbs.
EXPECTED: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string",
               "n_regionkey": "int"},
    "customer": {"c_custkey": "int", "c_name": "string",
                 "c_nationkey": "int", "c_acctbal": "float",
                 "c_mktsegment": "string"},
    "supplier": {"s_suppkey": "int", "s_name": "string",
                 "s_nationkey": "int", "s_acctbal": "float"},
    "part": {"p_partkey": "int", "p_name": "string", "p_brand": "string",
             "p_type": "string", "p_size": "int",
             "p_retailprice": "float"},
    "orders": {"o_orderkey": "int", "o_custkey": "int",
               "o_orderstatus": "string", "o_totalprice": "float",
               "o_orderdate": "timestamp", "o_orderpriority": "string"},
    "lineitem": {"l_orderkey": "int", "l_partkey": "int",
                 "l_suppkey": "int", "l_linenumber": "int",
                 "l_quantity": "float", "l_extendedprice": "float",
                 "l_discount": "float", "l_tax": "float",
                 "l_returnflag": "string", "l_linestatus": "string",
                 "l_shipdate": "timestamp"},
    "events": {"event_id": "int", "ts": "timestamp", "user_id": "int",
               "event_type": "string", "value": "float",
               "props": "string"},
    "documents": {"doc_id": "int", "text": "string", "lang": "string",
                  "source": "string", "n_chars": "int"},
    "embeddings": {"vec_id": "int", "embedding": "list<float>",
                   "label": "int"},
}

#: timestamp encodings with a validated normalization path
#: (tests/test_timestamp_encodings.py ENCODINGS matrix)
_TS_UNITS = {"ms", "us", "ns"}
_TS_TZS = {None, "UTC"}


def _family(t) -> str:
    import pyarrow as pa
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        # decimal is grouped with float so the message below can say
        # exactly what changed; a float->decimal flip still flags
        # because oracles compare rounded doubles
        return "decimal" if pa.types.is_decimal(t) else "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_family(t.value_type)}>"
    return str(t)


def check_testdata(sf_dir: str) -> list[str]:
    """Return a list of human-readable drift findings for ``sf_dir``
    (empty = everything matches a validated encoding)."""
    import pyarrow.parquet as pq

    problems: list[str] = []
    for table, cols in EXPECTED.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            problems.append(f"{table}: file missing at {path}")
            continue
        schema = pq.read_schema(path)
        names = set(schema.names)
        for col, fam in cols.items():
            if col not in names:
                problems.append(f"{table}.{col}: column missing "
                                f"(schema has {sorted(names)})")
                continue
            t = schema.field(col).type
            got = _family(t)
            if got != fam:
                problems.append(
                    f"{table}.{col}: type family changed — expected "
                    f"{fam}, parquet now has {t} (family {got})")
            import pyarrow as pa
            if pa.types.is_timestamp(t):
                if t.unit not in _TS_UNITS or t.tz not in _TS_TZS:
                    problems.append(
                        f"{table}.{col}: NEW timestamp encoding "
                        f"timestamp[{t.unit}, tz={t.tz!r}] — the engine "
                        f"normalizes only unit in {sorted(_TS_UNITS)} "
                        f"with tz in {{None, 'UTC'}}")
    return problems


def assert_testdata(sf_dir: str) -> None:
    """Raise RuntimeError naming every drifted column, with the fix
    recipe, so a new driver encoding fails the round's first command
    instead of its fiftieth oracle comparison."""
    problems = check_testdata(sf_dir)
    if problems:
        raise RuntimeError(
            "testdata encoding drift detected in %s:\n  - %s\n"
            "Fix: add a normalization arm in flink_dsl_spark/engine.py "
            "(_restore_nano_timestamps/_coerce_ntz) and a cell in "
            "tests/test_timestamp_encodings.py ENCODINGS, then update "
            "testdata_sentinel.EXPECTED."
            % (sf_dir, "\n  - ".join(problems)))
