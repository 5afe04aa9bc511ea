"""Unicode canonicalization for web-crawl text: NFC composition.

Crawled corpora mix composed and decomposed encodings of the same
glyphs (``é`` vs ``e`` + U+0301), which splits exact-dedup keys,
inflates vocabularies and breaks downstream tokenizers — NFC-first is
standard curation practice (it is what utf8proc-based cleaners do).

Spark has no built-in NFC, so this is an Arrow-batched Pandas UDF over
``unicodedata`` — partition-local, zero shuffle, and the per-batch
Python cost is one C-implemented call per row.  Cross-engine premise
for the DuckDB oracle (``nfc_normalize``): CPython's unicodedata and
DuckDB's utf8proc both implement Unicode normalization, and the
standard's normalization-stability policy guarantees the NFC of any
assigned codepoint never changes across Unicode versions, so the two
engines agree on any text either can represent (fuzzed over composed/
decomposed/combining-mark inputs, and pinned by an exhaustive BMP
sweep — every non-surrogate codepoint in a composing context, zero
divergences — in tests/test_llm_ops.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


# StringType() (not the DDL string "string"): the DDL form parses via
# the active SparkContext, which would make this module un-importable
# before a session exists.
@pandas_udf(StringType())
def _nfc(s: pd.Series) -> pd.Series:
    import unicodedata
    return s.map(lambda x: None if x is None
                 else unicodedata.normalize("NFC", x))


def nfc_normalize(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document NFC form plus a ``changed`` flag (the flag is the
    dataset-card number: what fraction of the crawl was non-canonical).
    The UDF runs once; ``changed`` compares against the original in a
    second projection so the plan carries one Arrow exchange per batch,
    not two."""
    d = df.select(F.col(id_col).alias("id"),
                  F.col(text_col).alias("__orig"),
                  _nfc(F.col(text_col)).alias("text_nfc"))
    return d.select("id", "text_nfc",
                    (F.col("text_nfc") != F.col("__orig"))
                    .alias("changed"))
