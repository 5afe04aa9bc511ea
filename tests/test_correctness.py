"""Oracle correctness: every __spark_entry__ query vs DuckDB at sf0.001.

This mirrors the driver's t2 gate (row-count + schema + order-insensitive
values), so a green run here predicts a green CORRECTNESS_r{N}.json.
"""

import pytest

import __spark_entry__ as entrymod
from .conftest import SF_DIR, assert_matches_oracle

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    df = _QUERIES[name](spark, SF_DIR)
    oracle = _ORACLES.get(name)
    if oracle is None:
        assert df.count() >= 0     # weaker rows-only check
        return
    assert_matches_oracle(df, duck, oracle, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 8


def test_priority_window_integrity():
    """The driver samples the FIRST 50 keys of queries(); a typo'd
    _PRIORITY key silently drops out of the ordered dict and SHIFTS
    the window — a below-fold query would be sampled unrehearsed.
    Pin: every priority key exists, no duplicates, the 50-key window
    is exactly the intended prefix, and every in-window batch query
    has a value oracle (streaming s* keys are checked too — their
    oracles exist; only the 8 documented rows-only-by-design keys may
    lack one, and at most the TWO ledgered rows-only re-entries may
    sit in the window: VERDICT r13 item 2 doubles r11's one-per-round
    cadence so the six never-cleanly-sampled run-only keys all have
    post-fix driver rows by r16 — r14: llm20 + llm21 (llm14 + llm15
    next in r15, llm22 + llm25 in r16).  NOTE such a row reads as
    run-only (rows_match NULL, 'no_oracle'): the driver skips all
    comparison without an oracle — r12 verdict item 5)."""
    pri = entrymod._PRIORITY
    assert len(pri) == len(set(pri)), "duplicate _PRIORITY keys"
    missing = [k for k in pri if k not in _QUERIES]
    assert not missing, f"_PRIORITY keys not in queries(): {missing}"
    window = list(_QUERIES)[:50]
    assert window == pri[:50], "window is not the _PRIORITY prefix"
    rows_only_reentry = {"llm20_split_dataset", "llm21_pack_sequences"}
    unoracled = [k for k in window
                 if k not in _ORACLES and k not in rows_only_reentry]
    assert not unoracled, \
        f"in-window keys without a value oracle: {unoracled}"
