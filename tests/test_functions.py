"""Edge-case unit tests for the expression libraries (naming, cleansing,
masking, text, vectors) on tiny literal DataFrames — complements the
oracle gate, which only sees the happy paths the test corpus produces."""

from __future__ import annotations

import json
import math

from pyspark.sql import functions as F

from data_ingestion_from_multiple_directories_linux_spark.functions.cleansing import (
    discover_date_columns,
    is_bad_date,
    normalize_null_sentinels,
    try_parse_timestamp,
)
from data_ingestion_from_multiple_directories_linux_spark.functions.masking import (
    mask_json_keys,
    mask_struct_value,
)
from data_ingestion_from_multiple_directories_linux_spark.functions.naming import (
    derive_batch_id,
    derive_table_name,
)
from data_ingestion_from_multiple_directories_linux_spark.functions.text import (
    shingles,
    tokens,
)
from data_ingestion_from_multiple_directories_linux_spark.functions.vectors import (
    cosine_q,
    dot_q,
    norm_sq_q,
    to_double_array,
)


def test_filename_parsing_variants():
    cases = {
        "patient_person_0_20250103141949.json": ("patient_person", "0"),
        "patient_person_12_20250103141949_decrypted.json": ("patient_person", "12"),
        "hts_client_345_20231231235959.json": ("hts_client", "345"),
        # table names containing digits mid-word keep them
        "covid19_results_7_20250101000000.json": ("covid19_results", "7"),
    }
    for fn, (table, batch) in cases.items():
        assert derive_table_name(fn) == table, fn
        assert derive_batch_id(fn) == batch, fn


def test_null_sentinels_exact_membership(spark):
    df = spark.createDataFrame(
        [("",), (" ",), ("null",), ("NULL",), ("  ",), ("x",), (None,)],
        "v string",
    )
    out = [r["c"] for r in df.select(normalize_null_sentinels("v").alias("c")).collect()]
    # only the exact three sentinels map to NULL ('NULL'/'  ' pass through,
    # matching the reference's literal replace list file_loader.py:489-491)
    assert out == [None, None, None, "NULL", "  ", "x", None]


def test_date_validation_verdicts(spark):
    df = spark.createDataFrame(
        [("2024-01-01",), ("2024-01-01 10:20:30",), ("not-a-date",),
         ("2024-02-31",), (None,)],
        "d string",
    )
    rows = df.select(
        try_parse_timestamp("d").alias("ts"), is_bad_date("d").alias("bad")
    ).collect()
    assert [r["bad"] for r in rows] == [False, False, True, True, False]
    assert rows[0]["ts"] is not None and rows[2]["ts"] is None


def test_discover_date_columns_rule():
    cols = ["date_of_birth", "visit_date", "update_dated", "dated_note", "uuid"]
    assert discover_date_columns(cols) == ["date_of_birth", "visit_date"]


def test_mask_json_keys_passthrough_shapes(spark):
    df = spark.createDataFrame(
        [
            (json.dumps({"surname": "X", "note": "k"}),),
            ("not json at all",),
            (json.dumps([1, 2, 3]),),  # non-object JSON
            (None,),
        ],
        "j string",
    )
    out = [r["m"] for r in df.select(mask_json_keys("j").alias("m")).collect()]
    assert json.loads(out[0]) == {"surname": "******", "note": "k"}
    assert out[1] == "not json at all"  # unparseable → unchanged
    assert out[2] == "[1, 2, 3]"  # non-object → unchanged
    assert out[3] is None


def test_mask_json_keys_preserves_value_types(spark):
    """Review-confirmed corruption, pinned fixed: non-PII values keep
    their JSON TYPES through masking — nested objects stay objects and
    numbers stay numbers (the old map<string,string> round-trip turned
    meta into an escaped string and age into '7')."""
    payload = json.dumps(
        {"surname": "SECRET", "meta": {"k": 1}, "age": 7,
         "tags": [1, 2], "ok": True, "phone_number": 801234}
    )
    df = spark.createDataFrame([(payload,)], "j string")
    out = json.loads(
        df.select(mask_json_keys("j").alias("m")).collect()[0]["m"]
    )
    assert out == {
        "surname": "******", "meta": {"k": 1}, "age": 7,
        "tags": [1, 2], "ok": True, "phone_number": "******",
    }
    # escape-aware: a quoted brace inside a PII string value
    tricky = '{"surname":"a\\"}b","note":"n"}'
    got = df.sparkSession.createDataFrame([(tricky,)], "j string").select(
        mask_json_keys("j").alias("m")
    ).collect()[0]["m"]
    assert json.loads(got) == {"surname": "******", "note": "n"}


def test_mask_json_keys_nested_and_exponent_values(spark):
    """Advisor findings pinned fixed: (1) a PII key whose value is a
    NESTED object/array must still be masked (the shallow-only pattern
    leaked it); (2) negative-exponent numbers must be consumed whole
    ('1e-05' half-matched to '"******"-05' — corrupt JSON)."""
    cases = [
        {"surname": {"a": {"b": 1}}, "note": "k"},          # depth-2 obj
        {"surname": [{"x": [1, {"y": 2}]}], "note": "k"},   # mixed nesting
        {"phone_number": 1e-05, "note": "k"},               # neg exponent
        {"phone_number": -2.5e7, "age": 3},                 # sign + exp
        {"surname": {"s": "}{"}, "note": "k"},              # braces in str
    ]
    df = spark.createDataFrame([(json.dumps(c),) for c in cases], "j string")
    outs = [r["m"] for r in df.select(mask_json_keys("j").alias("m")).collect()]
    for raw, out in zip(cases, outs):
        got = json.loads(out)  # output must stay valid JSON
        for k in ("surname", "phone_number"):
            if k in raw:
                assert got[k] == "******", (raw, got)
        # non-PII values keep their types
        if "note" in raw:
            assert got["note"] == "k"
        if "age" in raw:
            assert got["age"] == 3


def test_mask_json_keys_deep_values_regex_masked(spark):
    """Values nested well past the old depth-4 cap are masked by the
    linear-depth pattern WITHOUT the type-degrading fallback: sibling
    non-PII values keep their JSON types."""

    def nest(d, leaf):
        for _ in range(d):
            leaf = {"a": leaf}
        return leaf

    deep = {"surname": nest(10, 1), "age": 7, "meta": {"k": 1}}
    df = spark.createDataFrame([(json.dumps(deep),)], "j string")
    got = json.loads(
        df.select(mask_json_keys("j").alias("m")).collect()[0]["m"]
    )
    assert got == {"surname": "******", "age": 7, "meta": {"k": 1}}


def test_mask_json_keys_fallback_keeps_sibling_masking(spark):
    """Review finding pinned fixed: when one PII value nests deeper
    than the regex cap (>24) and the row falls back to the map rewrite,
    the fallback runs over the ALREADY-masked string — a nested sibling
    PII key masked by the regex pass must stay masked."""

    def nest(d, leaf):
        for _ in range(d):
            leaf = {"a": leaf}
        return leaf

    deep = {
        "phone_number": nest(30, 1),     # beyond the regex depth cap
        "note": {"surname": "LEAK"},     # maskable only by the regex pass
        "age": 7,
    }
    df = spark.createDataFrame([(json.dumps(deep),)], "j string")
    out = df.select(mask_json_keys("j").alias("m")).collect()[0]["m"]
    assert "LEAK" not in out
    got = json.loads(out)
    assert got["phone_number"] == "******"


def test_mask_json_keys_fuzz_equals_recursive_reference(spark):
    """Seeded fuzz pin of the single-pass regex mask: on 300 random
    nested documents (PII keys at arbitrary depth; string values with
    quotes/backslashes/braces/unicode; signed-exponent numbers;
    bool/null; nesting to depth 6) the output must equal the reference
    semantics — ``json.loads`` → recursively overwrite every PII key →
    ``json.dumps`` — generalized to all depths. One batch, one job."""
    import random

    from data_ingestion_from_multiple_directories_linux_spark.functions.masking import (
        PII_KEYS,
    )

    rng = random.Random(20260814)
    other_keys = ["note", "meta", "age", "tags", "k1", "k2"]
    strings = ['a"b', "x\\y", "}{", "[{", "héllo", "", "a b c", '\\"']

    def rand_value(depth):
        kind = rng.randrange(8 if depth < 6 else 5)
        if kind == 0:
            return rng.choice(strings)
        if kind == 1:
            return rng.choice([0, 7, -3, 10**15, -(10**15)])
        if kind == 2:
            return rng.choice([1e-05, -2.5e7, 0.125, -0.5, 1e20])
        if kind == 3:
            return rng.choice([True, False])
        if kind == 4:
            return None
        if kind == 5:
            return [rand_value(depth + 1) for _ in range(rng.randrange(3))]
        return rand_obj(depth + 1)

    def rand_obj(depth):
        n = rng.randrange(1, 4)
        keys = rng.sample(list(PII_KEYS) + other_keys, n)
        return {k: rand_value(depth) for k in keys}

    def ref_mask(v):
        if isinstance(v, dict):
            return {
                k: "******" if k in PII_KEYS else ref_mask(x)
                for k, x in v.items()
            }
        if isinstance(v, list):
            return [ref_mask(x) for x in v]
        return v

    docs = [rand_obj(0) for _ in range(300)]
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)], "i int, j string"
    )
    outs = {
        r["i"]: r["m"]
        for r in df.select("i", mask_json_keys("j").alias("m")).collect()
    }
    for i, d in enumerate(docs):
        assert json.loads(outs[i]) == ref_mask(d), (i, d, outs[i])


def test_decode_uri_name_raw_percent_passthrough(spark):
    """Advisor-flagged contract hazard pinned fixed: a raw (non-URI)
    name with a literal '%' passes through unchanged instead of
    throwing ILLEGAL_URL_DECODE; encoded names still decode."""
    from data_ingestion_from_multiple_directories_linux_spark.functions.naming import (
        file_name_of,
    )

    df = spark.createDataFrame(
        [("/d/report 100%.json",), ("/d/a%20b+c.json",)], "p string"
    )
    out = [r["f"] for r in df.select(file_name_of("p").alias("f")).collect()]
    assert out[0] == "report 100%.json"
    assert out[1] == "a b+c.json"


def test_mask_struct_value_null_safe(spark):
    df = spark.createDataFrame(
        [(("t1", json.dumps({"phone_number": "0801"})),), (None,)],
        "s struct<type:string, value:string>",
    )
    rows = df.select(mask_struct_value("s").alias("m")).collect()
    assert json.loads(rows[0]["m"]["value"]) == {"phone_number": "******"}
    assert rows[0]["m"]["type"] == "t1"
    assert rows[1]["m"] is None


def _mask_adversarial_corpus():
    """Rows covering every mask_pii branch: passthrough (NULL /
    non-JSON / no-PII), regex-pass masking at depth, and the
    >_CONTAINER_DEPTH residual that triggers the map fallback."""
    deep = "0"
    for _ in range(30):                      # 30 > _CONTAINER_DEPTH=24
        deep = f"[{deep}]"
    return [
        (0, None),
        (1, "not json"),
        (2, json.dumps({"note": "clean", "age": 7})),
        (3, json.dumps({"surname": "LEAK", "meta": {"first_name": "X"}})),
        (4, '{"surname": ' + deep + ', "note": {"phone_number": "0801"}}'),
        (5, json.dumps({"middle_name": 1e-05, "hospital_number": None})),
    ]


def test_mask_json_keys_staged_equals_expression(spark):
    """The two-stage DF form (heavy regexp materialized once behind a
    projection boundary) is result-identical to the one-expression
    ``mask_json_keys`` on a corpus exercising every branch, including
    the >24-deep map fallback."""
    from data_ingestion_from_multiple_directories_linux_spark.functions.masking import (
        mask_json_keys_staged,
    )

    df = spark.createDataFrame(_mask_adversarial_corpus(), "i int, j string")
    expr = {
        r["i"]: r["m"]
        for r in df.select("i", mask_json_keys("j").alias("m")).collect()
    }
    staged = {
        r["i"]: r["m"]
        for r in mask_json_keys_staged(df, "j", "m").select("i", "m").collect()
    }
    assert staged == expr
    assert "LEAK" not in (staged[3] or "")
    # fallback row: the sibling PII value masked by the regex pass
    # stays masked through the map rewrite (re-serialized, nested
    # object degraded to an escaped string — the documented fallback
    # type degradation)
    assert "0801" not in staged[4] and "******" in staged[4]


def test_mask_struct_value_staged_equals_expression(spark):
    """Struct twin: two-stage in-place masking of struct<type,value>
    equals the one-expression form, NULL structs included."""
    from data_ingestion_from_multiple_directories_linux_spark.functions.masking import (
        mask_struct_value_staged,
    )

    rows = [((f"t{i}", j),) for i, j in _mask_adversarial_corpus()] + [(None,)]
    df = spark.createDataFrame(rows, "s struct<type:string, value:string>")
    expr = [r["m"] for r in df.select(mask_struct_value("s").alias("m")).collect()]
    staged = [
        r["s"] for r in mask_struct_value_staged(df, "s").select("s").collect()
    ]
    assert staged == expr
    assert staged[-1] is None


def test_mask_staged_scratch_column_collision_raises(spark):
    """If the input frame already carries the staged maskers' scratch
    column (``__mask_stage1_<tag>``), ``withColumn`` would silently
    overwrite it and the final ``drop`` would destroy the CALLER'S
    column — so both staged forms must refuse loudly instead
    (sanitize_nonfinite's convention)."""
    import pytest as _pytest

    from data_ingestion_from_multiple_directories_linux_spark.functions.masking import (
        mask_json_keys_staged,
        mask_struct_value_staged,
    )

    df = spark.createDataFrame(
        [("{}", "precious")], "j string, __mask_stage1_m string"
    )
    with _pytest.raises(ValueError, match="__mask_stage1_m"):
        mask_json_keys_staged(df, "j", "m")

    df2 = spark.createDataFrame(
        [(("t", "{}"), "precious")],
        "s struct<type:string, value:string>, __mask_stage1_s string",
    )
    with _pytest.raises(ValueError, match="__mask_stage1_s"):
        mask_struct_value_staged(df2, "s")


def test_mask_json_keys_staged_plan(spark):
    """Plan pin for the round-8 double-evaluation fix: the staged form
    keeps the ~1.2 kB stage-1 regexp behind its own projection, so the
    physical plan carries exactly ONE regexp_replace (CollapseProject
    must decline to re-inline it into the fallback CASE's three
    branches); the one-expression form inlines it 3x. Same bug class
    as the round-7 language_id_ngram fix — codegen's subexpression
    elimination skips conditional branches."""
    from data_ingestion_from_multiple_directories_linux_spark.functions.masking import (
        mask_json_keys_staged,
    )

    import io
    from contextlib import redirect_stdout

    def formatted(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    df = spark.createDataFrame([(1, "{}")], "i int, j string")
    staged_plan = formatted(mask_json_keys_staged(df, "j", "m"))
    assert staged_plan.count("regexp_replace") == 1, staged_plan
    expr_plan = formatted(df.select(mask_json_keys("j").alias("m")))
    assert expr_plan.count("regexp_replace") >= 2


def test_tokens_and_shingles_edges(spark):
    df = spark.createDataFrame(
        [("  A  b\tC  ",), ("one two",), ("",)], "t string"
    )
    tok = df.select(tokens("t").alias("tk"))
    assert [r["tk"] for r in tok.collect()] == [["a", "b", "c"], ["one", "two"], []]
    sh = (
        tok.filter(F.size("tk") >= 2)
        .select(shingles("tk", 2).alias("sh"))
        .collect()
    )
    assert [r["sh"] for r in sh] == [["a b", "b c"], ["one two"]]


def test_quantized_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0, 0.0], [1.0, 0.0, 0.0]), ([1.0, 0.0, 0.0], [0.0, 1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    d = df.select(
        to_double_array("a").alias("a"), to_double_array("b").alias("b")
    )
    rows = d.select(
        cosine_q(dot_q("a", "b"), norm_sq_q("a"), norm_sq_q("b")).alias("c")
    ).collect()
    assert math.isclose(rows[0]["c"], 1.0, abs_tol=1e-8)
    assert rows[1]["c"] == 0.0


def test_char_chunk_udtf_edges(spark):
    """UDTF fan-out semantics: NULL text → no rows, exact-multiple text →
    no empty tail chunk, short text → one chunk; lateral join keeps the
    correlated doc id."""
    from data_ingestion_from_multiple_directories_linux_spark.functions.udfs import (
        char_chunk_udtf,
    )

    spark.udtf.register("char_chunks_t", char_chunk_udtf())
    spark.createDataFrame(
        [(1, "abcdef"), (2, "abc"), (3, None), (4, "")],
        "id bigint, t string",
    ).createOrReplaceTempView("__chunk_edge")
    rows = spark.sql(
        "SELECT id, chunk_idx, chunk FROM __chunk_edge, "
        "LATERAL char_chunks_t(t, 3)"
    ).collect()
    got = sorted((r["id"], r["chunk_idx"], r["chunk"]) for r in rows)
    assert got == [(1, 0, "abc"), (1, 1, "def"), (2, 0, "abc")]


def test_finite_float_predicates(spark):
    """is_finite / null_nonfinite / in_quant_domain truth tables on the
    full IEEE special-value zoo, evaluated through real Spark
    expressions (not python): NULL, NaN, ±Inf, ±DBL_MAX, a denormal,
    ±0.0, and the 10^4 quantization-domain boundary."""
    from data_ingestion_from_multiple_directories_linux_spark.functions.cleansing import (
        DBL_MAX,
        in_quant_domain,
        is_finite,
        null_nonfinite,
    )

    cases = [
        (1, None),
        (2, float("nan")),
        (3, float("inf")),
        (4, float("-inf")),
        (5, DBL_MAX),
        (6, -DBL_MAX),
        (7, 4.9406564584124654e-324),
        (8, -0.0),
        (9, 0.0),
        (10, 9999.999),
        (11, 10000.0),
        (12, -10000.0),
        (13, 42.5),
    ]
    df = spark.createDataFrame(cases, "id bigint, v double")
    got = {
        r.id: (r.fin, r.nn, r.qd)
        for r in df.select(
            "id",
            is_finite("v").alias("fin"),
            null_nonfinite("v").alias("nn"),
            in_quant_domain("v").alias("qd"),
        ).collect()
    }
    assert got[1] == (None, None, True)          # NULL: kept by domain
    assert got[2] == (False, None, False)        # NaN
    assert got[3] == (False, None, False)        # +Inf
    assert got[4] == (False, None, False)        # -Inf
    assert got[5] == (True, DBL_MAX, False)      # finite but huge
    assert got[6] == (True, -DBL_MAX, False)
    assert got[7][0] is True and got[7][2] is True   # denormal survives
    assert got[8] == (True, -0.0, True)
    assert got[9] == (True, 0.0, True)
    assert got[10] == (True, 9999.999, True)     # inside the boundary
    assert got[11] == (True, 10000.0, False)     # exactly AT it: out
    assert got[12] == (True, -10000.0, False)
    assert got[13] == (True, 42.5, True)


def test_sanitize_nonfinite_scoping(spark):
    """sanitize_nonfinite touches float/double scalars and float-array
    elements, and nothing else: strings/ints/timestamps pass through
    untouched, non-targeted columns are preserved, and a scoped
    `columns` list limits the rewrite."""
    from data_ingestion_from_multiple_directories_linux_spark.functions.cleansing import (
        sanitize_nonfinite,
    )

    df = spark.sql(
        """SELECT 1L AS id, 'x' AS s,
                  double('NaN') AS a, double('Infinity') AS b,
                  array(cast(1.5 as float), cast('NaN' as float)) AS v"""
    )
    out = sanitize_nonfinite(df).collect()[0]
    assert out.id == 1 and out.s == "x"
    assert out.a is None and out.b is None
    assert list(out.v) == [1.5, None]
    scoped = sanitize_nonfinite(df, columns=["a"]).collect()[0]
    assert scoped.a is None
    assert math.isinf(scoped.b)           # outside the scope: untouched
    assert math.isnan(scoped.v[1])


def test_sanitize_nonfinite_rejects_bad_columns(spark):
    """An explicitly-requested column that is missing or not
    float-typed raises ValueError — never a silent no-op (ADVICE r06:
    a typo'd name must not pass through looking cleansed)."""
    import pytest

    from data_ingestion_from_multiple_directories_linux_spark.functions.cleansing import (
        sanitize_nonfinite,
    )

    df = spark.sql("SELECT 1L AS id, 'x' AS s, double('NaN') AS a")
    with pytest.raises(ValueError, match="typo"):
        sanitize_nonfinite(df, columns=["typo"])
    with pytest.raises(ValueError, match="id"):
        sanitize_nonfinite(df, columns=["a", "id"])   # long: not float
    with pytest.raises(ValueError, match=r"\['s'\]"):
        sanitize_nonfinite(df, columns=["s"])         # string: not float
    # default scope still skips non-float columns without complaint
    assert sanitize_nonfinite(df).collect()[0].a is None


def test_sanitize_nonfinite_empty_list_is_noop(spark):
    """An explicit EMPTY columns list means "touch nothing" — it must
    NOT fall back to whole-table cleansing (ADVICE r07: a caller whose
    computed column list comes out empty would otherwise get every
    float column sanitized silently)."""
    from data_ingestion_from_multiple_directories_linux_spark.functions.cleansing import (
        sanitize_nonfinite,
    )

    df = spark.sql("SELECT 1L AS id, double('NaN') AS a")
    row = sanitize_nonfinite(df, columns=[]).collect()[0]
    assert math.isnan(row.a)              # untouched
    assert sanitize_nonfinite(df, columns=None).collect()[0].a is None


def test_quant_domain_oracle_literals():
    """Every oracle SQL carrying the quantization-domain gate derives
    it from ``fn/cleansing.SQL_IN_QUANT_DOMAIN`` (ADVICE r06 #2,
    landed r8 when the six files' driver rows rotated): the rendered
    oracles must carry the canonical QUANT_DOMAIN bound, and no
    operator SOURCE file may inline the literal by hand — a future
    domain change must flow through the one constant."""
    import glob
    import os
    import re

    import __spark_entry__ as E
    from data_ingestion_from_multiple_directories_linux_spark.functions.cleansing import (
        QUANT_DOMAIN,
        SQL_IN_QUANT_DOMAIN,
    )

    # The canonical template renders exactly the historical shape.
    assert (
        SQL_IN_QUANT_DOMAIN.format(c="value")
        == "(value IS NULL OR abs(value) < 10000)"
    )
    # Rendered oracles: every gate carries the canonical bound.
    pat = re.compile(r"(\w+) IS NULL OR abs\(\1\)\s*<\s*([0-9.eE+]+)")
    hits = 0
    for name, sql in E.oracle_sql().items():
        for m in pat.finditer(sql):
            hits += 1
            assert float(m.group(2)) == QUANT_DOMAIN, (
                f"{name}: quant-domain literal {m.group(2)} != "
                f"QUANT_DOMAIN {QUANT_DOMAIN}"
            )
    assert hits >= 6, f"expected >=6 rendered quant-domain gates, saw {hits}"
    # Source files: zero hand-inlined literals — interpolation only.
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    offenders = [
        p
        for p in glob.glob(
            os.path.join(
                root,
                "data_ingestion_from_multiple_directories_linux_spark",
                "operators",
                "*.py",
            )
        )
        if re.search(r"abs\(\w+\)\s*<\s*10000", open(p).read())
    ]
    assert not offenders, f"hand-inlined quant-domain literal in {offenders}"
