"""PII masking expressions (SURVEY.md §2.3 P4, §2.9 C10–C11).

The reference masks in three shapes:
* constant overwrite of name/phone columns with ``'******'``
  (file_loader.py:608-621, tables stg_hts_index_elicitation /
  stg_patient_person);
* ``mask_pii``: parse a JSON string, overwrite 5 keys if present,
  re-serialize (file_loader.py:523-536);
* struct rebuild: ``{'type': x['type'], 'value': mask_pii(x['value'])}``
  over the ``extra`` struct column (file_loader.py:606).

All three are JVM-side expressions. The JSON shape is an IN-PLACE
rewrite: one ``regexp_replace`` per PII key swaps that key's value for
``"******"`` and leaves every other byte untouched (types, key order
and formatting of non-PII values survive, like the reference's
``json.loads → overwrite → json.dumps`` preserves types). A guarded
``from_json(map<string,string>)`` fallback catches the rare value
nested deeper than the regex covers; a PII key can survive only in
the doubly-adversarial case of a >24-level-deep value inside a
document whose root is not a parseable JSON object (the reference's
own ``json.loads`` path masks nothing at all for such documents).
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

#: escape-aware JSON string token ("..." with \" handled).
_STR = '"(?:[^"\\\\]|\\\\.)*"'
#: JSON number grammar (int / frac / signed exponent) — a plain
#: character class corrupted negative exponents ('1e-05' matched only
#: '1e', leaving '"******"-05' behind; advisor-confirmed).
_NUM = "-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?"

#: containers nested deeper than this fall through to the map fallback.
_CONTAINER_DEPTH = 24


def _container_pat(depth: int) -> str:
    """Object/array pattern matching containers nested up to ``depth``
    levels, string-aware so braces inside quoted values don't unbalance
    the match. Nesting is bracket-type-AGNOSTIC (one alternative for
    ``{…}`` or ``[…]`` per level): real JSON never mismatches bracket
    types, and collapsing the two keeps pattern size LINEAR in depth
    (~1.2 kB at 24) instead of doubling per level, so the depth can sit
    far beyond any non-adversarial document. Alternatives are
    first-character-disjoint (quote / non-bracket / open-bracket), so
    matching is backtracking-safe."""
    inner = f'(?:{_STR}|[^"{{}}\\[\\]])*'
    for _ in range(depth - 1):
        nested = "[\\{\\[]" + inner + "[\\}\\]]"
        inner = f'(?:{_STR}|[^"{{}}\\[\\]]|{nested})*'
    return "\\{" + inner + "\\}|\\[" + inner + "\\]"


def mask_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Constant-overwrite masking: each named column becomes '******'
    (file_loader.py:608-621). Missing columns are ignored, matching the
    reference's hasattr-style tolerance."""
    present = [c for c in columns if c in df.columns]
    out = df
    for c in present:
        out = out.withColumn(c, F.lit(MASK))
    return out


def _legacy_map_mask(col: Column, keys: tuple[str, ...]) -> Column:
    """Leak-proof fallback: ``from_json(map<string,string>) →
    transform_values → to_json``. Retypes non-string values to strings
    on the way through (the reason it is NOT the primary path), but
    masks every top-level PII key regardless of value shape. NULL when
    the input is not a JSON object."""
    m = F.from_json(col, "map<string,string>")
    masked = F.transform_values(
        m, lambda k, v: F.when(k.isin(*keys), F.lit(MASK)).otherwise(v)
    )
    return F.to_json(masked)


def _mask_rewrite(src: Column, keys: tuple[str, ...]) -> Column:
    """Stage 1 of mask_pii: the single in-place ``regexp_replace``
    (~1.2 kB container-grammar pattern) that swaps every PII key's
    value for ``"******"`` at any nesting depth. The expensive stage —
    evaluate it ONCE per row."""
    value_pat = (
        _STR
        + "|" + _NUM
        + "|true|false|null"
        + "|" + _container_pat(_CONTAINER_DEPTH)
    )
    key_alt = '"(?:' + "|".join(keys) + ')"'
    return F.regexp_replace(
        src,
        "(" + key_alt + "\\s*:\\s*)(" + value_pat + ")",
        f'$1"{MASK}"',
    )


def _mask_finish(out: Column, keys: tuple[str, ...]) -> Column:
    """Stage 2 of mask_pii: the rare-fallback CASE over an
    ALREADY-REWRITTEN column — if a PII key is still followed by
    ``{``/``[`` (container nested deeper than the regex covers), fall
    back through the map rewrite. References ``out`` three times, so
    ``out`` should be a materialized attribute (see
    :func:`mask_json_keys_staged`), not an inline copy of the heavy
    stage-1 expression: whole-stage codegen's subexpression
    elimination skips conditional branches, so inlining evaluates the
    1.2 kB-pattern regexp up to 3x per row (measured 0.370 → 0.157 s
    on the sf0.1 props column — the same double-evaluation bug class
    as the round-7 ``language_id_ngram`` fix)."""
    residual = '"(?:' + "|".join(keys) + ')"' + "\\s*:\\s*[\\[{]"
    return F.when(
        out.rlike(residual), F.coalesce(_legacy_map_mask(out, keys), out)
    ).otherwise(out)


def mask_json_keys(col: Column | str, keys: tuple[str, ...] = PII_KEYS) -> Column:
    """mask_pii over a JSON-object string column.

    Replaces each PII key's VALUE with ``"******"`` in place via ONE
    JVM ``regexp_replace`` whose key position is an alternation over
    all PII keys, leaving every other byte of the payload untouched.
    (One combined pass, not one pass per key: the container grammar is
    ~1.2 kB of pattern, and chaining five ``regexp_replace`` calls —
    each re-scanning the document — measured 2-3x slower end-to-end at
    sf0.1. Leftmost-first matching makes the combined pass
    outcome-identical to the sequential per-key loop: a PII key nested
    inside another PII key's container value is consumed by the outer
    mask either way.) The earlier shape (``from_json(map<string,
    string>)`` → rewrite → ``to_json``) retyped EVERYTHING on the way
    through — nested objects came back as escaped strings and numbers
    as quoted strings (review-confirmed corruption for any hts_client
    ``extra.value`` carrying structure); the in-place rewrite preserves
    non-PII values, key order, and formatting exactly, like the
    reference's ``json.loads → overwrite → json.dumps`` preserves
    types (file_loader.py:523-536).

    Matched value shapes: JSON strings (escape-aware), numbers (full
    int/frac/exponent grammar), true/false/null, and objects/arrays
    nested up to ``_CONTAINER_DEPTH`` (24) levels. Keys are masked at
    ANY nesting depth. If, after the rewrite, a PII key is still
    followed by ``{``/``[`` (a container nested deeper than 24 levels),
    the ALREADY-masked string falls back through the map rewrite —
    masking over ``out`` rather than the source so the regex pass's
    any-depth masking of sibling keys is kept (review finding), and
    type-degrading for that one row only. Residual guarantee: a PII
    key can survive only when its value nests >24 deep AND the
    document's root is not a parseable JSON object (the map fallback
    needs an object root) — beyond any non-adversarial input. NULL and
    non-JSON inputs pass through unchanged, mirroring the reference's
    try/except passthrough.

    This one-expression form inlines the heavy stage-1 regexp into the
    fallback CASE's three branches, which codegen evaluates up to 3x
    per row. Fine inside struct/withField expression contexts and
    small per-file ingest batches; for a hot projection over a whole
    table use :func:`mask_json_keys_staged`, which materializes
    stage 1 once behind a projection boundary (measured 2.36x)."""
    src = F.col(col) if isinstance(col, str) else col
    return _mask_finish(_mask_rewrite(src, keys), keys)


def _stage1_tmp_name(df: DataFrame, tag: str) -> str:
    """Scratch-column name for the staged maskers. Raises loudly if the
    frame already carries a column of that name — ``withColumn`` would
    silently overwrite it and the final ``drop`` would then destroy the
    caller's column (cleansing.sanitize_nonfinite's loud-failure
    convention: a collision must not become a silent data loss)."""
    tmp = f"__mask_stage1_{tag}"
    if tmp in df.columns:
        raise ValueError(
            f"staged masking needs scratch column {tmp!r}, but the "
            "input frame already has a column of that name; rename it "
            "or use the one-expression mask_json_keys/mask_struct_value"
        )
    return tmp


def mask_json_keys_staged(
    df: DataFrame,
    src: Column | str,
    alias: str,
    keys: tuple[str, ...] = PII_KEYS,
) -> DataFrame:
    """Two-stage mask_pii: appends ``alias`` = masked ``src`` to
    ``df``, evaluating the ~1.2 kB-pattern stage-1 ``regexp_replace``
    exactly ONCE per row.

    Identical results to ``mask_json_keys`` (property-tested); the
    difference is plan shape: stage 1 lands in its own projection, and
    the stage-2 fallback CASE references it as a bound attribute.
    ``CollapseProject`` correctly declines to re-inline — the alias is
    consumed three times by non-cheap expressions — so the plan keeps
    two Projects and the regexp runs once (0.370 → 0.157 s on the
    sf0.1 props column; plan-pinned by
    tests/test_functions.py::test_mask_json_keys_staged_plan)."""
    tmp = _stage1_tmp_name(df, alias)
    src_col = F.col(src) if isinstance(src, str) else src
    return (
        df.withColumn(tmp, _mask_rewrite(src_col, keys))
        .withColumn(alias, _mask_finish(F.col(tmp), keys))
        .drop(tmp)
    )


def mask_struct_value(col: Column | str, keys: tuple[str, ...] = PII_KEYS) -> Column:
    """Struct rebuild for ``extra`` columns shaped
    ``struct<type:string, value:string>`` where ``value`` is a JSON string
    (file_loader.py:606): keep ``type``, mask inside ``value``.
    One-expression form (inlines the heavy stage-1 regexp into the
    fallback branches); for hot whole-table scans use
    :func:`mask_struct_value_staged`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.isNull(), c
    ).otherwise(c.withField("value", mask_json_keys(c.getField("value"), keys)))


def mask_struct_value_staged(
    df: DataFrame, name: str, keys: tuple[str, ...] = PII_KEYS
) -> DataFrame:
    """Two-stage :func:`mask_struct_value`, in place on column
    ``name``: stage 1 (the heavy regexp over ``name.value``) lands in
    its own projection; the struct rebuild's fallback CASE references
    it as a bound attribute, so the regexp runs once per row instead
    of once per conditional branch. NULL structs pass through like the
    one-expression form (a NULL struct yields a NULL stage-1 value,
    and the outer ``when`` short-circuits the rebuild)."""
    tmp = _stage1_tmp_name(df, name)
    c = F.col(name)
    return (
        df.withColumn(tmp, _mask_rewrite(c.getField("value"), keys))
        .withColumn(
            name,
            F.when(c.isNull(), c).otherwise(
                c.withField("value", _mask_finish(F.col(tmp), keys))
            ),
        )
        .drop(tmp)
    )
