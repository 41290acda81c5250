"""Sanctioned Python escape hatch (SURVEY.md §2.12): Arrow-batched
pandas UDFs for per-table custom transforms (G2).

Everything in the engine's hot path is JVM-side Column expressions; when
a transform genuinely needs Python (a tokenizer, a model, a library),
the contract is:

* ``@F.pandas_udf`` scalar UDFs ONLY — Arrow moves columns in vectorized
  batches (~10-100× faster than row-at-a-time ``F.udf``, which this
  engine never uses);
* register via :func:`column_transform` into
  ``IngestionEngine.transforms[table]`` — the same dispatch table the
  built-in masking rules use (engine.py ``_default_transforms``);
* batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  — worker memory = batch_rows × row width.

``normalize_whitespace`` is the reference example (and is genuinely
useful for text hygiene before tokenization).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# returnType as a DataType instance, not a DDL string: string parsing at
# decoration time would demand an active SparkSession at import.
@F.pandas_udf(T.StringType())
def normalize_whitespace(s: pd.Series) -> pd.Series:
    """Trim + collapse internal whitespace runs to single spaces —
    vectorized over Arrow batches."""
    return s.str.strip().str.replace(r"\s+", " ", regex=True)


def column_transform(
    column: str, udf: Callable[[Column], Column]
) -> Callable[[DataFrame], DataFrame]:
    """Wrap a (pandas-)UDF into a G2 transform entry:

    >>> eng.transforms["notes"] = [column_transform("body", normalize_whitespace)]

    Missing columns are ignored, matching the dispatch table's tolerance
    for per-table schema drift."""

    def apply(df: DataFrame) -> DataFrame:
        if column not in df.columns:
            return df
        return df.withColumn(column, udf(F.col(column)))

    return apply


# --- Python UDTF: the TABLE-function escape hatch -------------------------
#
# Scalar pandas UDFs return one value per row; when a transform FANS OUT
# (one document → many chunks, one payload → many extracted records) the
# sanctioned surface is a Python UDTF (Spark 3.5+) used under a LATERAL
# join. Row-at-a-time by nature — for hot paths prefer native
# explode/sequence compositions (operators/corpus.py document_chunks) or
# Arrow-batched mapInPandas (operators/multimodal.py); the UDTF earns its
# keep as the SQL-visible form: registered once, any SQL user can
# `FROM t, LATERAL fn(t.col)` without touching Python.


class CharChunkUDTF:
    """Fixed-width character chunker: (text, width) → (chunk_idx, chunk)
    rows. NULL text yields no rows (a quarantined document contributes
    nothing downstream)."""

    def eval(self, text: str | None, width: int):
        if text is None or width is None or width <= 0:
            return
        for start in range(0, len(text), width):
            yield start // width, text[start : start + width]


def char_chunk_udtf():
    """The decorated UDTF object (decoration deferred: @udtf parses the
    DDL return type, which needs an active SparkSession at import time
    otherwise)."""
    from pyspark.sql.functions import udtf

    return udtf(CharChunkUDTF, returnType="chunk_idx bigint, chunk string")
