"""Corpus sampling operators: UniMax language-balanced budget
allocation (Chung et al. 2023, "UniMax: Fairer and More Effective
Language Sampling for Large-Scale Multilingual Pretraining").

The allocation walks languages from smallest to largest; each takes
``min(epochs * its_size, remaining_budget // languages_left)``, so
low-resource languages are fully included (up to the epoch cap) and
the leftover budget splits evenly among the high-resource ones.  The
loop runs on the driver over the per-language totals — model-sized
state (one row per language), the same contract as the IVF centroid
table.  Document selection stays fully distributed: a deterministic
hash order per language and one cumulative-sum window keep documents
until the quota is filled, so the draw is reproducible across runs,
partitionings, and engines (no rand()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic order key: the engine-portable multiplicative hash
# over the 2^31-masked id (mask keeps the product inside int64 in
# both Spark and DuckDB — see PERF.md on overflow semantics).
_KNUTH = 2654435761
_MASK = 2147483648  # 2^31
_RANGE = 4294967296  # 2^32


def hash_order_key(doc_id: Column) -> Column:
    return ((doc_id % _MASK) * F.lit(_KNUTH)) % F.lit(_RANGE)


def unimax_quotas(
    per_lang: list[tuple[str, int]], budget: int, epochs: int = 1
) -> dict[str, int]:
    """UniMax allocation over (lang, token_count) rows.  Pure integer
    arithmetic (floor division) so any engine replaying the same walk
    gets bit-identical quotas."""
    if budget < 0 or epochs < 1:
        raise ValueError("budget must be >= 0 and epochs >= 1")
    ordered = sorted(per_lang, key=lambda t: (t[1] * epochs, t[0]))
    quotas: dict[str, int] = {}
    remaining = budget
    for i, (lang, n_tok) in enumerate(ordered):
        left = len(ordered) - i
        q = min(n_tok * epochs, remaining // left)
        quotas[lang] = q
        remaining -= q
    return quotas


def unimax_select(
    docs: DataFrame,
    quotas: dict[str, int],
    lang_col: str = "lang",
    id_col: str = "doc_id",
    ntok_col: str = "n_tok",
) -> DataFrame:
    """Keep documents per language, in deterministic hash order, while
    the cumulative token count stays within the language's quota.
    One window pass partitioned by language — the only shuffle."""
    from pyspark.sql import Window as W

    quota_col = F.lit(None).cast("bigint")
    for lang, q in sorted(quotas.items()):
        quota_col = F.when(F.col(lang_col) == lang, F.lit(q)).otherwise(
            quota_col
        )
    w = (
        W.partitionBy(lang_col)
        .orderBy(hash_order_key(F.col(id_col)), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        docs.withColumn("__quota", quota_col)
        .withColumn("__cum", F.sum(F.col(ntok_col)).over(w))
        .filter(F.col("__cum") <= F.col("__quota"))
        .drop("__cum")
        .withColumnRenamed("__quota", "quota")
    )


def weighted_priority(doc_id: Column, weight: Column) -> Column:
    """Efraimidis-Spirakis (A-ES) weighted-sampling priority with the
    deterministic hash standing in for rand(): classic A-ES draws
    u ~ U(0,1) per item and keeps the top-k by ``u**(1/w)``; ordering
    by ``ln(u) / w`` is order-EQUIVALENT (ln is monotone, both sides
    negative, w > 0) and numerically safer than the pow form.  Using
    ``hash_order_key`` for u makes the draw reproducible across runs,
    partitionings, and engines — the same no-rand() contract as the
    stratified/temperature samplers.  Top-k by this key DESC is a
    weighted sample WITHOUT replacement: P(item first) = w_i / sum(w),
    then renormalized over the rest, as in the paper."""
    u = (hash_order_key(doc_id) + F.lit(0.5)) / F.lit(float(_RANGE))
    return F.log(u) / weight.cast("double")


def weighted_sample(
    df: DataFrame, doc_id: str, weight: str, k: int
) -> DataFrame:
    """Top-k rows by A-ES priority (weight-proportional inclusion,
    without replacement, deterministic).  The plan is a narrow
    stateless projection + TakeOrderedAndProject — per-partition
    top-k then a k-sized driver merge, never a global sort."""
    pri = weighted_priority(F.col(doc_id), F.col(weight))
    return (
        df.withColumn("__pri", pri)
        # doc_id tiebreak: priorities are doubles computed from
        # transcendentals — a unique tail keeps the k-boundary stable
        # even if two priorities land equal
        .orderBy(F.desc("__pri"), F.col(doc_id))
        .limit(k)
        .drop("__pri")
    )
