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

    Parses to ``MapType(string,string)``, overwrites the PII keys that are
    present (others untouched), re-serializes. NULL and non-object inputs
    pass through unchanged (from_json yields NULL → coalesce keeps the
    original), mirroring the reference's try/except passthrough
    (file_loader.py:534-536).
    """
    c = F.col(col) if isinstance(col, str) else col
    parsed = F.from_json(c, "map<string,string>")
    masked = F.transform_values(
        parsed,
        lambda k, v: F.when(k.isin(*keys), F.lit(MASK)).otherwise(v),
    )
    # to_json(NULL map) is NULL, so one parse serves both the rewrite and
    # the non-object passthrough (a when(parsed.isNull()) guard would
    # evaluate from_json twice in interpreted mode)
    return F.coalesce(F.to_json(masked), c)


def mask_struct_value(col: Column | str, keys: tuple[str, ...] = PII_KEYS) -> Column:
    """Struct rebuild for ``extra`` columns shaped
    ``struct<type:string, value:string>`` where ``value`` is a JSON string
    (file_loader.py:606): keep ``type``, mask inside ``value``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull(), c
    ).otherwise(c.withField("value", mask_json_keys(c.getField("value"), keys)))
