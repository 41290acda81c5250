"""PII masking expressions (SURVEY.md §2.3 P4, §2.9 C10–C11).

The reference masks in three shapes:
* constant overwrite of name/phone columns with ``'******'``
  (file_loader.py:608-621, tables stg_hts_index_elicitation /
  stg_patient_person);
* ``mask_pii``: parse a JSON string, overwrite 5 keys if present,
  re-serialize (file_loader.py:523-536);
* struct rebuild: ``{'type': x['type'], 'value': mask_pii(x['value'])}``
  over the ``extra`` struct column (file_loader.py:606).

All three are JVM-side expressions here — the JSON shape uses
from_json(MapType) → map rewrite → to_json, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MASK = "******"

#: JSON keys mask_pii overwrites when present (file_loader.py:528-533).
PII_KEYS: tuple[str, ...] = (
    "surname",
    "first_name",
    "middle_name",
    "phone_number",
    "hospital_number",
)


def mask_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Constant-overwrite masking: each named column becomes '******'
    (file_loader.py:608-621). Missing columns are ignored, matching the
    reference's hasattr-style tolerance."""
    present = [c for c in columns if c in df.columns]
    out = df
    for c in present:
        out = out.withColumn(c, F.lit(MASK))
    return out


def mask_json_keys(col: Column | str, keys: tuple[str, ...] = PII_KEYS) -> Column:
    """mask_pii over a JSON-object string column.

    Replaces each PII key's VALUE with ``"******"`` in place via one
    JVM ``regexp_replace`` per key, leaving every other byte of the
    payload untouched. The earlier shape (``from_json(map<string,
    string>)`` → rewrite → ``to_json``) retyped EVERYTHING on the way
    through — nested objects came back as escaped strings and numbers
    as quoted strings (review-confirmed corruption for any hts_client
    ``extra.value`` carrying structure); the in-place rewrite preserves
    non-PII values, key order, and formatting exactly, like the
    reference's ``json.loads → overwrite → json.dumps`` preserves
    types (file_loader.py:523-536).

    Matched value shapes: JSON strings (escape-aware), numbers,
    true/false/null, and shallow (non-nested) objects/arrays. NULL and
    non-JSON inputs pass through unchanged (no key pattern matches),
    mirroring the reference's try/except passthrough. Keys are masked
    at ANY nesting depth — strictly more protective than the
    reference's top-level-only rewrite."""
    out = F.col(col) if isinstance(col, str) else col
    value_pat = (
        '"(?:[^"\\\\]|\\\\.)*"'      # string, escape-aware
        "|-?[\\d.eE+]+"              # number
        "|true|false|null"           # literals
        "|\\{[^{}]*\\}|\\[[^\\[\\]]*\\]"  # shallow object / array
    )
    for k in keys:
        out = F.regexp_replace(
            out,
            '("' + k + '"\\s*:\\s*)(' + value_pat + ")",
            f'$1"{MASK}"',
        )
    return out


def mask_struct_value(col: Column | str, keys: tuple[str, ...] = PII_KEYS) -> Column:
    """Struct rebuild for ``extra`` columns shaped
    ``struct<type:string, value:string>`` where ``value`` is a JSON string
    (file_loader.py:606): keep ``type``, mask inside ``value``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull(), c
    ).otherwise(c.withField("value", mask_json_keys(c.getField("value"), keys)))
