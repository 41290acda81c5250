"""The composed training-data pipeline: one lineage, end to end.

The engine's LLM-pipeline operators are individually oracle-checked
(canonical-URL dedup L131, exact dedup L1, MinHash-LSH near-dup L2,
trained quality gate L135, benchmark decontamination L29, leakage-safe
split L138/L142, curriculum phases L156, sequence packing L63). A 100 TB
job runs them as ONE DAG — this module wires that DAG so the composition
itself is a benched, plan-audited artifact (the bench.py ``pipeline``
section and tests/test_funnel_pipeline.py), not just a set of stages
that pass separately. Precedent: the L99 pytest funnel; this promotes it
to real operator reuse + a throughput figure (train tokens packed per
wall-second).

Corpus: `documents` plus three deterministic twin families, offsets
derived from max(doc_id)+1 (never a fixed constant — the containment
lesson), so every dedup stage has real mass to remove and attribution
is checkable:

* URL twins (every 17th doc): same page fetched under a different messy
  spelling (host case, default port, trailing slash, utm_* params —
  the urlnorm catalog) → removed by canonical-URL dedup, the cheapest
  stage, BEFORE any text is shingled.
* exact twins (every 11th doc): same text under a genuinely different
  URL → removed by the sha-256 groupBy.
* near twins (every 7th doc): text plus 4 appended tokens (the dedup.py
  convention) → removed by MinHash-LSH + connected components.

Stage order is the production order and the point of the composition:
each stage shrinks the frame the next (more expensive) stage reads —
URL string ops < one hash per doc < shingle/MinHash join < trained-gate
scoring < 8-gram decontamination probe. The near-dup EDGES are computed
once and feed BOTH the dedup drop and the leakage-safe split's cluster
representatives (no second shingle pass). Token counts are computed
once on the persisted corpus frame and reused by the gate features,
curriculum thresholds, and the packing prefix-sum.

Scale notes (100 TB): every stage is the scale shape its registered
operator documents — hash-aggregate dedups, bucketed LSH with the
bucket_cap skew guard, broadcast eval-shingle probe, histogram-exact
curriculum bounds (no global sort), two-phase prefix-sum packing (no
Exchange SinglePartition). The only driver-side data are bounded
metadata: 4 gate-weight numbers per GD step, ≤3 curriculum bounds,
≤PACK_NBUCKETS packing subtotals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import STOPWORDS, shingles, tokens
from .corpus import (
    DECON_EVAL_MOD,
    DECON_NGRAM,
    PACK_BUDGET,
    PACK_NBUCKETS,
    SPLIT_TRAIN_BELOW,
    SPLIT_VAL_BELOW,
)
from .dedup import (
    JACCARD_MINHASH_THRESHOLD,
    connected_components,
    minhash_pairs,
)
from .training import Y_SCALE, train_linear_gate
from .traindata import N_PHASES
from .urlnorm import url_canonicalize

#: twin cadences (relatively prime, so families overlap realistically).
URL_DUP_MOD = 17
EXACT_DUP_MOD = 11
NEAR_DUP_MOD = 7
#: MinHash shingle width (the ngram_jaccard_pairs convention).
FUNNEL_SHINGLE_N = 4
#: hot-bucket skew guard — production setting, same knob bench.py probes.
FUNNEL_BUCKET_CAP = 64
#: gate keep rule: predicted label ≥ half of Y_SCALE (the trained gate
#: regresses y ∈ {0, Y_SCALE}; ≥ half is the symmetric decision point).
GATE_KEEP_MILLI = Y_SCALE // 2


def _messy_url(page: Column, variant: Column) -> Column:
    """The urlnorm catalog's four messy spellings of one resource,
    keyed on a variant selector instead of doc_id so twins can point at
    their original's page under a DIFFERENT spelling."""
    p = page.cast("string")
    return (
        F.when(variant % 4 == 0, F.concat(F.lit("https://example.com/p/"), p))
        .when(
            variant % 4 == 1,
            F.concat(
                F.lit("https://EXAMPLE.com/p/"),
                p,
                F.lit("?utm_source=feed&utm_medium=rss"),
            ),
        )
        .when(
            variant % 4 == 2,
            F.concat(F.lit("HTTPS://example.com:443/p/"), p, F.lit("/")),
        )
        .otherwise(
            F.concat(
                F.lit("https://Example.COM/p/"),
                p,
                F.lit("?x=1&utm_a=2&utm_b=3#section-2"),
            )
        )
    )


def funnel_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + the three twin families: (doc_id, text, lang,
    n_chars, page, variant, n_tok, n_stop). Token statistics are
    computed HERE, once, on the frame every stage shares."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    off = d.agg((F.max("doc_id") + F.lit(1)).alias("_off"))
    base = d.crossJoin(F.broadcast(off))

    def proj(doc_id, text, page, variant, n_chars):
        return [
            doc_id.cast("long").alias("doc_id"),
            text.alias("text"),
            F.col("lang").alias("lang"),
            n_chars.cast("long").alias("n_chars"),
            page.cast("long").alias("page"),
            variant.cast("long").alias("variant"),
        ]

    did = F.col("doc_id")
    # variants 0-2 are canonical-EQUAL spellings (case/port/slash/utm
    # noise); variant 3 carries a real ?x=1 param and canonicalizes to a
    # different resource — the registered urlnorm query exercises it, the
    # funnel's twins must not (a twin under it would survive URL dedup)
    orig = base.select(*proj(did, F.col("text"), did, did % 3, F.col("n_chars")))
    url_twin = base.filter(did % URL_DUP_MOD == 0).select(
        *proj(
            did + F.col("_off"),
            F.col("text"),
            did,  # SAME page, different spelling
            (did + 1) % 3,
            F.col("n_chars"),
        )
    )
    exact_twin = base.filter(did % EXACT_DUP_MOD == 0).select(
        *proj(
            did + 2 * F.col("_off"),
            F.col("text"),
            did + 2 * F.col("_off"),  # own page: survives URL dedup
            did % 3,
            F.col("n_chars"),
        )
    )
    near_twin = base.filter(did % NEAR_DUP_MOD == 0).select(
        *proj(
            did + 3 * F.col("_off"),
            F.concat(F.col("text"), F.lit(" zz yy xx qq")),
            did + 3 * F.col("_off"),
            did % 3,
            F.col("n_chars") + 12,
        )
    )
    corpus = (
        orig.unionByName(url_twin)
        .unionByName(exact_twin)
        .unionByName(near_twin)
    )
    toks = tokens("text")
    return corpus.select(
        "*",
        F.size(toks).cast("long").alias("n_tok"),
        F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
        .cast("long")
        .alias("n_stop"),
    )


def training_funnel(spark: SparkSession, sf_dir: str) -> dict:
    """Run the composed pipeline; returns stage counts, the trained gate
    weights, token totals, and the final packed-train frame under
    ``result`` (doc_id, phase, n_tokens, start_offset, seq_id)."""
    corpus = funnel_corpus(spark, sf_dir).persist()
    counts: dict[str, int] = {"synthesized": corpus.count()}

    # 1 cleanse: text present and tokenizable
    c1 = corpus.filter(F.col("text").isNotNull() & (F.col("n_tok") > 0))
    counts["cleansed"] = c1.count()

    # 2 canonical-URL dedup (string ops only — runs before any shingling)
    canon = c1.select(
        "doc_id",
        url_canonicalize(_messy_url(F.col("page"), F.col("variant"))).alias(
            "cu"
        ),
    )
    keep_url = canon.groupBy("cu").agg(F.min("doc_id").alias("doc_id"))
    d2 = c1.join(keep_url.select("doc_id"), "doc_id", "semi")
    counts["url_dedup"] = d2.count()

    # 3 exact dedup: one keeper per sha-256(text)
    keep_sha = d2.groupBy(F.sha2("text", 256).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    d3 = d2.join(keep_sha.select("doc_id"), "doc_id", "semi").persist()
    counts["exact_dedup"] = d3.count()

    # 4 MinHash-LSH near-dup dedup; the edges feed the split stage too
    edges = minhash_pairs(
        d3.select("doc_id", "text"),
        FUNNEL_SHINGLE_N,
        JACCARD_MINHASH_THRESHOLD,
        bucket_cap=FUNNEL_BUCKET_CAP,
    )
    labels = connected_components(edges).persist()
    losers = labels.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    d4 = d3.join(losers, "doc_id", "left_anti").persist()
    counts["near_dedup"] = d4.count()

    # 5 quality gate, trained IN the pipeline on the deduped survivors
    feats = d4.select(
        F.col("n_tok").alias("x_tok"),
        F.col("n_chars").alias("x_char"),
        F.col("n_stop").alias("x_stop"),
        F.when(F.col("lang") == "en", F.lit(Y_SCALE))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
    )
    w = {
        k: v
        for k, v in train_linear_gate(feats)[-1].items()
        if k in ("w_tok", "w_char", "w_stop", "bias")
    }
    z = (
        F.lit(w["w_tok"]) * F.col("n_tok")
        + F.lit(w["w_char"]) * F.col("n_chars")
        + F.lit(w["w_stop"]) * F.col("n_stop")
        + F.lit(w["bias"])
    )
    d5 = d4.filter(z >= GATE_KEEP_MILLI).persist()
    counts["quality_gate"] = d5.count()

    # 6 benchmark decontamination: eval slice + anything sharing an
    # 8-gram with it leaves the training pool (broadcast shingle probe)
    tokd = d5.select("doc_id", tokens("text").alias("toks")).filter(
        F.size("toks") >= DECON_NGRAM
    )
    ex = tokd.select(
        "doc_id", F.explode_outer(shingles("toks", DECON_NGRAM)).alias("s")
    ).filter(F.col("s").isNotNull())
    ev_sh = (
        ex.filter(F.col("doc_id") % DECON_EVAL_MOD == 0).select("s").distinct()
    )
    contaminated = (
        ex.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
        .join(F.broadcast(ev_sh), "s")
        .select("doc_id")
        .distinct()
    )
    d6 = (
        d5.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
        .join(contaminated, "doc_id", "left_anti")
        .persist()
    )
    counts["decontaminated"] = d6.count()

    # 7 leakage-safe split: hash the near-dup cluster REPRESENTATIVE
    # (the same labels frame stage 4 built — one shingle pass total)
    rep = d6.join(
        labels.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        "n_tok",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("rep"),
    )
    h = F.substring(F.md5(F.col("rep").cast("string").cast("binary")), 1, 1)
    split = rep.select(
        "doc_id",
        "n_tok",
        F.when(h < SPLIT_TRAIN_BELOW, "train")
        .when(h < SPLIT_VAL_BELOW, "val")
        .otherwise("test")
        .alias("split"),
    ).persist()
    counts["split_total"] = split.count()
    train = split.filter(F.col("split") == "train").persist()
    counts["train"] = train.count()

    # empty train pool (tiny/adversarial corpora can filter or split
    # everything away): the packing stage needs min/max(doc_id) over
    # train, undefined here — return a schema-stable empty packed frame
    # with zero totals instead of crashing on int(None)
    if counts["train"] == 0:
        empty = train.select(
            "doc_id",
            F.lit(1).cast("long").alias("phase"),
            F.col("n_tok").cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("start_offset"),
            F.lit(0).cast("long").alias("seq_id"),
        )
        return {
            "counts": counts,
            "weights": w,
            "tokens_train": 0,
            "n_sequences": 0,
            "result": empty,
        }

    # 8 curriculum phases over the train pool: histogram-exact token
    # quartile bounds (≤3 driver-side numbers), no global sort
    hist = train.groupBy("n_tok").agg(F.count("*").cast("long").alias("cnt"))
    cum = hist.select(
        "n_tok", F.sum("cnt").over(W.orderBy("n_tok")).alias("cum")
    )
    n_train = counts["train"]
    bounds = [
        int(r["t"])
        for r in cum.crossJoin(
            F.broadcast(
                spark.range(1, N_PHASES).select(F.col("id").alias("p"))
            )
        )
        .filter(F.col("cum") * N_PHASES >= F.col("p") * F.lit(n_train))
        .groupBy("p")
        .agg(F.min("n_tok").alias("t"))
        .collect()
    ]
    phase = F.lit(1)
    for t in bounds:
        phase = phase + F.when(F.col("n_tok") > t, 1).otherwise(0)

    # 9 sequence packing: two-phase prefix sum (bounded metadata only)
    b = train.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).first()
    lo, hi = int(b["lo"]), int(b["hi"])
    width = (hi - lo) // PACK_NBUCKETS + 1
    t = train.withColumn(
        "_b", F.expr(f"CAST((doc_id - {lo}) DIV {width} AS BIGINT)")
    )
    subs = t.groupBy("_b").agg(F.sum("n_tok").alias("s")).collect()
    running, prefix_rows = 0, []
    for row in sorted(subs, key=lambda r: r["_b"]):
        prefix_rows.append((int(row["_b"]), running))
        running += int(row["s"])
    pref = spark.createDataFrame(prefix_rows, "_b bigint, _pref bigint")
    win = (
        W.partitionBy("_b")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offc = F.col("_pref") + F.coalesce(F.sum("n_tok").over(win), F.lit(0))
    packed = t.join(F.broadcast(pref), "_b").select(
        "doc_id",
        phase.cast("long").alias("phase"),
        F.col("n_tok").cast("long").alias("n_tokens"),
        offc.cast("long").alias("start_offset"),
        F.floor(offc / PACK_BUDGET).cast("long").alias("seq_id"),
    )

    tokens_train = running  # Σ n_tok over train — already reduced
    n_sequences = (tokens_train + PACK_BUDGET - 1) // PACK_BUDGET
    return {
        "counts": counts,
        "weights": w,
        "tokens_train": tokens_train,
        "n_sequences": n_sequences,
        "result": packed,
    }
