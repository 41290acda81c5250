"""DPO / pairwise-preference data preparation.

Preference-tuning (DPO, RLHF reward modeling) consumes PAIRS — for
one prompt, a chosen and a rejected response — and building those
pairs at corpus scale is a data-engineering problem with two sharp
edges this operator handles:

1. **Pair construction must be deterministic and margin-gated.** For
   each prompt group the best- and worst-scored candidates form the
   pair (ranked by the SAME integer quality score the calibration
   family serves — operators/calibration.py's z, reused, not
   re-derived), and pairs whose score margin is below ``MARGIN_MIN``
   are dropped: a near-tie pair is label noise that actively hurts a
   Bradley-Terry objective.
2. **Neither side of a pair may leak the eval set.** A chosen OR
   rejected text sharing an 8-gram with the benchmark slice
   contaminates the preference model's eval exactly like pretraining
   contamination — so both candidates pass the L31 decontamination
   probe (operators/corpus.py's shingle/eval-slice machinery,
   imported so the definitions cannot drift), and eval-slice
   documents themselves are excluded from candidacy.

Plan shape: score + group assignment are a pure projection; the
contamination probe is the L31 inverted-index broadcast semi-join
(eval shingles are benchmark-sized — MBs at 100 TB — so the probe is
a map-side hash lookup); pair selection is ONE shuffle by prompt
group + one window sort + one conditional aggregation (no self-join
of candidates, no doc×doc anything). Group keys are synthetic here
(``doc_id % PROMPT_MOD`` — the corpus has no real prompt ids); a real
pipeline swaps the grouping column and nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import shingles, tokens
from .calibration import _SCORED_SQL, _scored
from .corpus import DECON_EVAL_MOD, DECON_NGRAM, _SH8, _TOK
from .registry import query

#: synthetic prompt-group fold (docs with equal doc_id % PROMPT_MOD are
#: candidate responses to the same prompt).
PROMPT_MOD = 23

#: minimum chosen-minus-rejected score margin (milli-logits) — pairs
#: closer than this are preference noise, not signal.
MARGIN_MIN = 500

#: the decontaminated candidate pool, SQL side — shared verbatim by the
#: DPO-pair and GRPO-advantage oracles so the two preference surfaces
#: can never disagree about who is a clean candidate.
_CAND_CTES = f"""scored AS ({_SCORED_SQL}),
    tok AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(len(toks) - {DECON_NGRAM - 1}),
                                            i -> {_SH8})) AS sh
        FROM tok WHERE len(toks) >= {DECON_NGRAM}
    ),
    ex AS (SELECT doc_id, unnest(sh) AS s FROM sh),
    eval_sh AS (
        SELECT DISTINCT s FROM ex WHERE doc_id % {DECON_EVAL_MOD} = 0
    ),
    contaminated AS (
        SELECT DISTINCT ex.doc_id FROM ex JOIN eval_sh USING (s)
        WHERE ex.doc_id % {DECON_EVAL_MOD} <> 0
    ),
    cand AS (
        SELECT doc_id, z, doc_id % {PROMPT_MOD} AS group_id
        FROM scored
        WHERE z IS NOT NULL
          AND doc_id % {DECON_EVAL_MOD} <> 0
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    )"""


def _clean_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(group_id, doc_id, z) — scored, non-eval, decontaminated
    candidate pool (the Spark twin of ``_CAND_CTES``), shared by the
    DPO-pair and GRPO-advantage queries."""
    from ..catalog import load_table

    scored = _scored(spark, sf_dir).filter(F.col("z").isNotNull())

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tokd = d.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= DECON_NGRAM
    )
    ex = tokd.select(
        "doc_id", F.explode_outer(shingles("toks", DECON_NGRAM)).alias("s")
    ).filter(F.col("s").isNotNull())
    eval_sh = (
        ex.filter(F.col("doc_id") % DECON_EVAL_MOD == 0).select("s").distinct()
    )
    contaminated = (
        ex.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
        .join(F.broadcast(eval_sh), "s")
        .select("doc_id")
        .distinct()
    )
    return (
        scored.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select(
            (F.col("doc_id") % PROMPT_MOD).alias("group_id"), "doc_id", "z"
        )
    )


@query(
    "dpo_preference_pairs",
    oracle=f"""
    WITH {_CAND_CTES},
    ranked AS (
        SELECT group_id, doc_id, z,
               ROW_NUMBER() OVER (PARTITION BY group_id
                                  ORDER BY z DESC, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY group_id) AS cnt
        FROM cand
    ),
    pairs AS (
        SELECT group_id,
               MAX(CASE WHEN rn = 1 THEN doc_id END) AS chosen_doc_id,
               MAX(CASE WHEN rn = 1 THEN z END) AS chosen_z,
               MAX(CASE WHEN rn = cnt THEN doc_id END) AS rejected_doc_id,
               MAX(CASE WHEN rn = cnt THEN z END) AS rejected_z,
               MAX(cnt) AS n_candidates
        FROM ranked
        GROUP BY group_id
    )
    SELECT CAST(group_id AS BIGINT) AS group_id,
           CAST(chosen_doc_id AS BIGINT) AS chosen_doc_id,
           CAST(rejected_doc_id AS BIGINT) AS rejected_doc_id,
           CAST(chosen_z - rejected_z AS BIGINT) AS margin,
           CAST(n_candidates AS BIGINT) AS n_candidates
    FROM pairs
    WHERE n_candidates >= 2 AND chosen_z - rejected_z >= {MARGIN_MIN}
    """,
)
def dpo_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One decontaminated, margin-gated preference pair per prompt
    group: the top- and bottom-scored clean candidates (quality-gate z,
    ties broken by doc_id), groups with fewer than two clean candidates
    or a margin under MARGIN_MIN dropped. Columns: group_id,
    chosen_doc_id, rejected_doc_id, margin, n_candidates."""
    cand = _clean_candidates(spark, sf_dir)
    by_group = Window.partitionBy("group_id")
    ranked = cand.select(
        "group_id",
        "doc_id",
        "z",
        F.row_number()
        .over(by_group.orderBy(F.desc("z"), F.asc("doc_id")))
        .alias("rn"),
        F.count("*").over(by_group).alias("cnt"),
    )
    pairs = ranked.groupBy("group_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
            "chosen_doc_id"
        ),
        F.max(F.when(F.col("rn") == 1, F.col("z"))).alias("chosen_z"),
        F.max(F.when(F.col("rn") == F.col("cnt"), F.col("doc_id"))).alias(
            "rejected_doc_id"
        ),
        F.max(F.when(F.col("rn") == F.col("cnt"), F.col("z"))).alias(
            "rejected_z"
        ),
        F.max("cnt").alias("n_candidates"),
    )
    return pairs.filter(
        (F.col("n_candidates") >= 2)
        & (F.col("chosen_z") - F.col("rejected_z") >= MARGIN_MIN)
    ).select(
        F.col("group_id").cast("long").alias("group_id"),
        F.col("chosen_doc_id").cast("long").alias("chosen_doc_id"),
        F.col("rejected_doc_id").cast("long").alias("rejected_doc_id"),
        (F.col("chosen_z") - F.col("rejected_z"))
        .cast("long")
        .alias("margin"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
    )


@query(
    "grpo_group_advantages",
    oracle=f"""
    WITH {_CAND_CTES},
    stats AS (
        SELECT group_id,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(z) AS BIGINT) AS s,
               CAST(SUM(z * z) AS BIGINT) AS ss
        FROM cand GROUP BY group_id
    )
    SELECT CAST(c.group_id AS BIGINT) AS group_id,
           CAST(c.doc_id AS BIGINT) AS doc_id,
           CAST(c.z AS BIGINT) AS reward,
           CAST(t.n_samples * c.z - t.s AS BIGINT) AS adv_num,
           CAST(t.n_samples * t.ss - t.s * t.s AS BIGINT) AS var_num,
           t.n_samples
    FROM cand c JOIN stats t USING (group_id)
    WHERE t.n_samples >= 2
    """,
)
def grpo_group_advantages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative advantage preparation (the GRPO/RLOO shape): for
    every clean candidate, its reward (the quality-gate z standing in
    for a reward-model score) centered against its PROMPT GROUP — the
    per-group baseline that replaces a learned value function.

    Everything stays in exact integers (the mergeable-statistics
    device): ``adv_num = n·r − Σr`` is the advantage scaled by n, and
    ``var_num = n·Σr² − (Σr)²`` is the group variance scaled by n² —
    the trainer's whitening step ``adv = adv_num / sqrt(n·var_num)``
    is a trivial consumer-side float projection, kept OUT of the
    engine so no cross-engine sqrt ulp can drift the hash (the L101
    exact-moment convention). Groups with a single clean candidate
    carry no signal and are dropped.

    Plan: the candidate pool (same decontaminated pool as the DPO
    pairs — shared CTEs/builder) aggregates per group (map-side
    partials, |groups| rows), then joins back — at 100 TB the stats
    side is prompt-count-sized and broadcasts."""
    cand = _clean_candidates(spark, sf_dir)
    stats = cand.groupBy("group_id").agg(
        F.count("*").cast("long").alias("n_samples"),
        F.sum("z").cast("long").alias("s"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("ss"),
    )
    return (
        cand.join(F.broadcast(stats), "group_id")
        .filter(F.col("n_samples") >= 2)
        .select(
            F.col("group_id").cast("long").alias("group_id"),
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("z").cast("long").alias("reward"),
            (F.col("n_samples") * F.col("z") - F.col("s"))
            .cast("long")
            .alias("adv_num"),
            (
                F.col("n_samples") * F.col("ss") - F.col("s") * F.col("s")
            )
            .cast("long")
            .alias("var_num"),
            "n_samples",
        )
    )
