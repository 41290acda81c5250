"""Text-analysis expressions for LLM-data-pipeline operators.

The reference has no text analytics (its payloads are relational JSON
records); these are the additive operators a large-scale training-data
pipeline needs (BASELINE.json north star): tokenization, shingling,
MinHash signatures, SimHash fingerprints, quality scores, language-ID
heuristics.

Everything is a JVM-side Column expression (split / filter / transform /
aggregate / xxhash64 / md5) — no Python UDFs — so the whole text pass
stays inside whole-stage codegen and scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Whitespace tokenizer regex (shared with DuckDB oracles: string_split_regex).
WS_RE = r"\s+"

#: BPE-ish token regex: letter runs, digit runs, single other-symbols.
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

#: Tiny English stopword set for quality scoring / language ID.
STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of", "to", "in", "is")

#: English-marker character bigrams for the language-ID heuristic.
EN_BIGRAMS: tuple[str, ...] = ("th", "he", "er", "an")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of lower(text), empty strings removed."""
    return F.filter(
        F.split(F.lower(_c(col)), WS_RE), lambda x: x != F.lit("")
    )


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish tokens: letter runs / digit runs / single symbols."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(BPE_RE), 0)


def shingles(tok: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array.

    ``transform(sequence(0, size-n), i -> concat_ws(' ', tok[i+1..i+n]))``
    — caller must filter ``size(tok) >= n`` first (sequence with a
    negative stop errors).
    """
    t = _c(tok)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + k + 1) for k in range(n)]
            ),
        )
    )


def minhash_signature_aggs(shingle_col: str, n_hashes: int = 64) -> list[Column]:
    """MinHash signature as ``n_hashes`` MIN-aggregations over exploded
    shingles: ``min(xxhash64(shingle, seed_i))``.

    Use after ``explode(shingles)``: one hash-partitioned groupBy produces
    the full signature — map-side partial MINs make this a single cheap
    shuffle of (doc, 64 longs) regardless of document size.
    """
    s = F.col(shingle_col)
    return [
        F.min(F.xxhash64(s, F.lit(i))).alias(f"h{i}") for i in range(n_hashes)
    ]


def band_buckets(n_bands: int = 32, rows_per_band: int = 2) -> Column:
    """LSH band buckets from a minhash signature row (columns h0..h63):
    bucket_b = xxhash64(h_{b*r} .. h_{b*r+r-1}, b).

    With r=2, b=32 the probability that a pair with true Jaccard >= 0.7
    shares NO band is (1 - 0.49)^32 ~= 4e-10 — the banded join is an
    exact-recall candidate generator for any practical corpus, while
    only ever joining within buckets (never all pairs).
    """
    return F.array(
        *[
            F.xxhash64(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                F.lit(b),
            )
            for b in range(n_bands)
        ]
    )


def stopword_hits(tok: Column | str, words: tuple[str, ...] = STOPWORDS) -> Column:
    """Number of tokens that are stopwords."""
    return F.size(F.filter(_c(tok), lambda x: x.isin(*words)))


def token_char_sum(tok: Column | str) -> Column:
    """Total characters across tokens (for mean token length)."""
    return F.aggregate(
        _c(tok), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def punct_count(col: Column | str) -> Column:
    """Count of non-alphanumeric, non-whitespace characters."""
    c = _c(col)
    return (F.length(c) - F.length(F.regexp_replace(c, r"[^a-zA-Z0-9\s]", ""))).cast(
        "long"
    )


def bigram_count(col: Column | str, bigram: str) -> Column:
    """Occurrences of a character n-gram via replace-length arithmetic
    (portable to any SQL engine; overlapping occurrences count once per
    non-overlapping match, same on both sides). Divides by the
    pattern's ACTUAL length — a hardcoded 2 broke any non-bigram
    caller (review finding)."""
    c = F.lower(_c(col))
    return (
        F.length(c) - F.length(F.replace(c, F.lit(bigram), F.lit("")))
    ) / F.lit(len(bigram))


def simhash16_aggs(token_col: str) -> list[Column]:
    """16 per-bit SimHash vote sums over exploded distinct tokens.

    Bit j's vote for one token = parity of the (j+1)-th hex nibble of
    md5(token), mapped to ±1; the fingerprint bit is 1 iff the vote sum
    is positive. md5-nibble parity is chosen over xxhash64 bit-tricks so
    an external SQL engine (the DuckDB oracle) reproduces it exactly.
    """
    out = []
    for j in range(16):
        nib = F.expr(
            f"instr('0123456789abcdef', substring(md5({token_col}), {j + 1}, 1)) - 1"
        )
        out.append(F.sum((nib % 2) * 2 - 1).alias(f"s{j}"))
    return out


def simhash16_assemble() -> Column:
    """Fingerprint from the 16 vote sums s0..s15 (bit j set iff s_j > 0)."""
    fp = F.lit(0).cast("long")
    for j in range(16):
        fp = fp + F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(0)
    return fp.cast("long")
