"""In-engine training of the quality-gate classifier.

``operators/calibration.py`` CALIBRATES a linear quality gate whose
integer weights it treats as pre-trained ("training lives elsewhere").
This module closes that loop: the same weights are trained IN the
engine — batch gradient descent on squared loss over the same integer
surface features (token count, char count, stopword hits), every step
an exact integer DataFrame aggregate, so the whole trajectory is
oracle-replayable bit-for-bit.

Why this is exact (and why that matters):

* **Integer features, integer targets.** x = (n_tokens, n_chars,
  n_stopwords, 1) are BIGINTs; the label is scaled to the model's
  milli-logit space (y · 1000), so the residual r = w·x − 1000·y and
  the gradient sums Σ r·x_j are exact BIGINT aggregates — no float
  accumulation order to drift between engines.
* **Fixed-point learning rates.** The update is
  ``w_j ← w_j − floor(g_j / (n · D_j))`` with per-feature integer
  denominators D_j (a diagonal preconditioner ≈ 2·E[x_j²] rounded to a
  round number — mandatory because the surface features differ by two
  orders of magnitude). Dividing the SUM by n·D_j normalizes by corpus
  size, so the step magnitude — and convergence — is scale-invariant:
  the same constants train at sf0.001 and at 100 TB.
* **floor, not truncate.** Spark's ``div`` truncates toward zero while
  DuckDB's ``//`` floors, so negative gradients would round apart. The
  update uses the non-negative-mod identity
  ``floor(a / b) = (a - ((a % b + b) % b)) / b`` (exact integer
  division — the numerator is divisible by b), which both engines
  evaluate identically; driver-side Python ``//`` floors natively.

Scale shape: each of the K+1 steps is ONE distributed corpus pass
(project + all-to-one partial aggregate of 6 BIGINTs); only the
6-number stat row reaches the driver per step (the `train_bpe_merges`
precedent — the model is O(1), the data never moves). At 100 TB the
aggregate sums fit DECIMAL(38,0) if BIGINT ever gets tight (|Σ r·x| ≲
n · 10⁷ here — BIGINT holds to n ≈ 10¹¹ documents).

Reference parity: the reference repo has no model training; this is
part of the additive LLM-data-pipeline surface (SURVEY.md §2.12a),
feeding the L129/L130 calibration pair with weights trained on the
same engine that serves them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..catalog import load_table
from ..functions.text import STOPWORDS, tokens
from .calibration import BIAS, W_CHAR, W_STOP, W_TOK
from .registry import query
from .text_analysis import TOK_SQL

#: the label, scaled into the model's milli-logit output space.
Y_SCALE = 1000

#: per-feature fixed-point learning-rate denominators (step_j =
#: floor(Σ r·x_j / (n · D_j))) — the diagonal preconditioner, each
#: ≈ 4·E[x_j²] for the documents corpus rounded to a round number
#: (E[x_tok²] ≈ 3e3, E[x_char²] ≈ 1e5, E[x_stop²] ≈ 16, bias ≈ 1; the
#: extra 2× under pure Newton keeps the correlated-feature descent
#: monotone — SSE strictly decreases at every tested SF, pinned in
#: tests/test_llm_pipeline.py).
D_TOK, D_CHAR, D_STOP, D_BIAS = 20_000, 800_000, 100, 8

#: gradient-descent steps the registered query runs (rows = steps + 1:
#: the init row plus one per update).
TRAIN_STEPS = 3

_FEATS_SQL = f"""
    SELECT CAST(len({TOK_SQL.format(c='text')}) AS BIGINT) AS x_tok,
           CAST(n_chars AS BIGINT) AS x_char,
           CAST(len(list_filter({TOK_SQL.format(c='text')},
                                x -> x IN {STOPWORDS!r})) AS BIGINT) AS x_stop,
           CAST(CASE WHEN lang = 'en' THEN {Y_SCALE} ELSE 0 END AS BIGINT) AS y
    FROM documents
    WHERE text IS NOT NULL AND n_chars IS NOT NULL
"""


def _sql_floordiv(a: str, b: str) -> str:
    """DuckDB floor division via the non-negative-mod identity (DuckDB
    ``//`` already floors, but spelling the identity keeps the oracle
    textually parallel to the Spark expression it must replay)."""
    return f"(({a}) - ((({a}) % ({b}) + ({b})) % ({b}))) // ({b})"


def _oracle_training_ctes(steps: int) -> list[str]:
    """The shared CTE chain: ``feats``, weight states ``w0..w{steps}``
    and stat passes ``s0..s{steps}`` (``s{k}`` measured AT ``w{k}``) —
    the building block for both the trajectory oracle and the
    trained-weights calibration oracle."""
    names = ("g_tok", "g_char", "g_stop", "g_bias")
    denoms = (D_TOK, D_CHAR, D_STOP, D_BIAS)
    wcols = ("w_tok", "w_char", "w_stop", "bias")
    ctes = [f"feats AS ({_FEATS_SQL})"]
    ctes.append(
        f"w0 AS (SELECT CAST({W_TOK} AS BIGINT) AS w_tok,"
        f" CAST({W_CHAR} AS BIGINT) AS w_char,"
        f" CAST({W_STOP} AS BIGINT) AS w_stop,"
        f" CAST({BIAS} AS BIGINT) AS bias)"
    )
    for k in range(steps + 1):
        r = (
            f"(w.w_tok * x_tok + w.w_char * x_char"
            f" + w.w_stop * x_stop + w.bias - y)"
        )
        ctes.append(
            f"""s{k} AS (
            SELECT CAST(SUM({r} * x_tok) AS BIGINT) AS g_tok,
                   CAST(SUM({r} * x_char) AS BIGINT) AS g_char,
                   CAST(SUM({r} * x_stop) AS BIGINT) AS g_stop,
                   CAST(SUM({r}) AS BIGINT) AS g_bias,
                   CAST(SUM({r} * {r}) AS BIGINT) AS sse
            FROM feats, w{k} w)"""
        )
        if k < steps:
            # empty-corpus guard (G4 parity): COUNT(*)=0 makes every
            # SUM NULL — COALESCE the gradient to 0 and clamp the
            # divisor with GREATEST so the update is a no-op (weights
            # hold; the OUTPUT gradients/sse stay NULL per SUM
            # semantics) instead of NULL-poisoning the trajectory.
            upd = ", ".join(
                f"w{k}.{wc} - "
                f"({_sql_floordiv(f'COALESCE(s{k}.{g}, 0)', f'GREATEST(cnt.n, 1) * {d}')})"
                f" AS {wc}"
                for wc, g, d in zip(wcols, names, denoms)
            )
            ctes.append(
                f"w{k + 1} AS (SELECT {upd} FROM w{k}, s{k},"
                f" (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feats) cnt)"
            )
    return ctes


def _oracle_training_sql(steps: int) -> str:
    """Unrolled K-step training trajectory: CTE ``s{k}`` is the stat
    pass at weights ``w_k``; the weight literals are folded by the SAME
    Python arithmetic the Spark path uses, so the oracle text replays
    each update from the previous step's aggregates symbolically."""
    rows = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS step, w{k}.w_tok, w{k}.w_char,"
        f" w{k}.w_stop, w{k}.bias, s{k}.g_tok, s{k}.g_char, s{k}.g_stop,"
        f" s{k}.g_bias, s{k}.sse FROM w{k}, s{k}"
        for k in range(steps + 1)
    )
    return "WITH " + ",\n".join(_oracle_training_ctes(steps)) + "\n" + rows


_TRAIN_SCHEMA = StructType(
    [
        StructField(c, LongType(), True)
        for c in (
            "step w_tok w_char w_stop bias "
            "g_tok g_char g_stop g_bias sse".split()
        )
    ]
)


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True (guide §2.4/§6): the feature map is tokenization-heavy
    # (two interpreted HOF passes per document) and the step-0 aggregate
    # materializes it from the one-row-group test parquet — unspread it
    # runs on a single core (VERDICT r12 item 6; measured in
    # OPTIMIZATION_r13.md). No-op at warehouse scale (layout-probed).
    d = load_table(spark, sf_dir, "documents", spread=True).filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    toks = tokens("text")
    return d.select(
        F.size(toks).cast("long").alias("x_tok"),
        F.col("n_chars").cast("long").alias("x_char"),
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
        .cast("long")
        .alias("x_stop"),
        F.when(F.col("lang") == "en", F.lit(Y_SCALE))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
    )


def train_linear_gate(
    feats: DataFrame,
    init: tuple[int, int, int, int] = (W_TOK, W_CHAR, W_STOP, BIAS),
    steps: int = TRAIN_STEPS,
    denoms: tuple[int, int, int, int] = (D_TOK, D_CHAR, D_STOP, D_BIAS),
) -> list[dict[str, int]]:
    """Run ``steps`` batch-GD updates on squared loss over a frame of
    (x_tok, x_char, x_stop, y) BIGINT columns. Each step is ONE
    distributed aggregate; only the 6-number stat row is collected
    (the train_bpe_merges device). Returns the trajectory: one dict per
    step 0..steps with the weights AT that step and the gradient/SSE
    measured at them. Python ``//`` floors, matching the oracle's
    integer floor division exactly."""
    feats = feats.persist()
    try:
        w = dict(zip(("w_tok", "w_char", "w_stop", "bias"), init))
        out: list[dict[str, int]] = []
        for k in range(steps + 1):
            r = (
                F.lit(w["w_tok"]) * F.col("x_tok")
                + F.lit(w["w_char"]) * F.col("x_char")
                + F.lit(w["w_stop"]) * F.col("x_stop")
                + F.lit(w["bias"])
                - F.col("y")
            )
            s = feats.agg(
                F.sum(r * F.col("x_tok")).cast("long").alias("g_tok"),
                F.sum(r * F.col("x_char")).cast("long").alias("g_char"),
                F.sum(r * F.col("x_stop")).cast("long").alias("g_stop"),
                F.sum(r).cast("long").alias("g_bias"),
                F.sum(r * r).cast("long").alias("sse"),
                F.count("*").cast("long").alias("n"),
            ).first()
            out.append(
                {
                    "step": k,
                    **w,
                    "g_tok": s["g_tok"],
                    "g_char": s["g_char"],
                    "g_stop": s["g_stop"],
                    "g_bias": s["g_bias"],
                    "sse": s["sse"],
                }
            )
            if k < steps:
                # empty-corpus guard (G4 parity, mirrors the oracle's
                # COALESCE/GREATEST): zero rows → NULL sums → no-op
                # update; weights hold, output gradients stay NULL.
                n = max(s["n"], 1)
                for wc, g, d in zip(
                    ("w_tok", "w_char", "w_stop", "bias"),
                    ("g_tok", "g_char", "g_stop", "g_bias"),
                    denoms,
                ):
                    w[wc] = w[wc] - ((s[g] or 0) // (n * d))
        return out
    finally:
        feats.unpersist()


def _oracle_trained_calibration_sql(steps: int) -> str:
    """Reliability-table oracle scored with the STEP-``steps`` trained
    weights: the training CTE chain, then the L129 binning over
    z = w_K·x (same BIN_W, same floor-over-double binning)."""
    from .calibration import BIN_W

    ctes = _oracle_training_ctes(steps)
    scored = f"""scored AS (
        SELECT w.w_tok * x_tok + w.w_char * x_char
               + w.w_stop * x_stop + w.bias AS z,
               CASE WHEN y = {Y_SCALE} THEN 1 ELSE 0 END AS pos
        FROM feats, w{steps} w)"""
    bin_sql = f"CAST(floor(CAST(z AS DOUBLE) / {BIN_W}) AS BIGINT)"
    return (
        "WITH "
        + ",\n".join(ctes + [scored])
        + f"""
    SELECT {bin_sql} AS bin,
           {bin_sql} * {BIN_W} AS z_lo,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST((1000 * SUM(pos)) // COUNT(*) AS BIGINT) AS rate_milli
    FROM scored
    GROUP BY 1
    """
    )


@query(
    "trained_gate_calibration",
    oracle=_oracle_trained_calibration_sql(TRAIN_STEPS),
)
def trained_gate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train → serve, composed: the reliability table of L129 computed
    with the weights the TRAIN_STEPS-step in-engine training produced
    (not the fixed init) — per score-bin document count, positive count
    and integer-exact positive rate, binned exactly like
    quality_calibration_bins (same BIN_W, same floor-over-double). The
    oracle re-derives the trained weights through the same unrolled CTE
    chain, so a single hash compare certifies the whole
    train-then-calibrate dataflow end to end."""
    w = train_linear_gate(_features(spark, sf_dir))[-1]
    return calibration_bins_for_weights(spark, sf_dir, w)


@query("quality_gate_training", oracle=_oracle_training_sql(TRAIN_STEPS))
def quality_gate_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full TRAIN_STEPS-step training trajectory of the quality
    gate: step number, the integer weight vector at that step, and the
    exact gradient + SSE measured at it. Every number is an integer
    aggregate, so the DuckDB oracle — which unrolls the identical
    updates as chained CTEs — replays the trajectory bit-for-bit;
    SSE decreasing down the rows is the training actually working
    (pinned by tests/test_llm_pipeline.py).
    """
    rows = train_linear_gate(_features(spark, sf_dir))
    return spark.createDataFrame(
        [
            tuple(
                None if r[c] is None else int(r[c])
                for c in (
                    "step w_tok w_char w_stop bias "
                    "g_tok g_char g_stop g_bias sse".split()
                )
            )
            for r in rows
        ],
        _TRAIN_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Model persistence: train once, serve from any later session
# ---------------------------------------------------------------------------

#: persisted gate-weight table (the fifth persistent-state family,
#: beside IVF/PQ codebooks, the MinHash band index, the Bloom bit
#: table and the streaming checkpoint).
GATE_WEIGHTS_TABLE = "_quality_gate_weights"


def save_gate_weights(store, w: dict[str, int]) -> None:
    """Persist a trained weight vector (one row, atomic swap). Integer
    weights round-trip parquet exactly, so a reloaded model scores
    BIT-IDENTICALLY to the in-session one (pytest: cross-process
    e2e)."""
    row = [(int(w["w_tok"]), int(w["w_char"]), int(w["w_stop"]), int(w["bias"]))]
    store.overwrite(
        GATE_WEIGHTS_TABLE,
        store.spark.createDataFrame(
            row, "w_tok long, w_char long, w_stop long, bias long"
        ),
    )


def load_gate_weights(store) -> dict[str, int]:
    """Reload the persisted gate weights into the driver-side dict the
    scoring/calibration expressions consume."""
    r = store.read(GATE_WEIGHTS_TABLE).first()
    return {
        "w_tok": r["w_tok"],
        "w_char": r["w_char"],
        "w_stop": r["w_stop"],
        "bias": r["bias"],
    }


def calibration_bins_for_weights(
    spark: SparkSession, sf_dir: str, w: dict[str, int]
) -> DataFrame:
    """The L129 reliability table at an ARBITRARY weight vector — the
    serve-side scoring path shared by ``trained_gate_calibration``
    (fresh weights) and a session that only reloaded them."""
    from .calibration import BIN_W

    feats = _features(spark, sf_dir)
    z = (
        F.lit(w["w_tok"]) * F.col("x_tok")
        + F.lit(w["w_char"]) * F.col("x_char")
        + F.lit(w["w_stop"]) * F.col("x_stop")
        + F.lit(w["bias"])
    )
    pos = F.when(F.col("y") == Y_SCALE, F.lit(1)).otherwise(F.lit(0))
    b = F.floor(z.cast("double") / BIN_W).cast("long")
    return (
        feats.select(b.alias("bin"), pos.alias("pos"))
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
        )
        .select(
            "bin",
            (F.col("bin") * BIN_W).alias("z_lo"),
            "n",
            "n_pos",
            F.expr("(1000 * n_pos) div n").cast("long").alias("rate_milli"),
        )
    )
