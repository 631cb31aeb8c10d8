"""Benchmark-contamination detection: word-n-gram overlap between a
training corpus and an evaluation set.

The standard decontamination step of a pre-training pipeline (GPT-3
trained with 13-gram collision filtering — Brown et al. 2020, appendix
C; followed by PaLM/Llama variants): any training document sharing a
long-enough word n-gram with an eval document is flagged (and usually
dropped) so benchmark numbers aren't inflated by memorized test items.

Construction is the inverted-index equi-join — the same linear-ish shape
as the shingle index in ``operators/dedup.py``: explode each side's
DISTINCT n-grams, join on the n-gram, count collisions per (corpus doc,
eval doc). No pair is materialized unless the two documents actually
share an n-gram, so cost scales with collisions, not with
|corpus| x |eval|. At 100 TB the eval side is tiny (benchmarks are
thousands of items), so Spark broadcasts it and the corpus side never
shuffles at all.

The per-document n-gram construction mirrors the chunking/shingling
transform: ``transform(sequence(...), i -> array_join(slice(toks,i,n)))``
— a per-row HOF whose iteration count is ~tokens-per-doc (see the
measured HOF note in ``operators/dedup.py``: this shape beats the
explode+window rewrite at realistic doc lengths).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ghcn_d_etl_project_spark.operators.textops import tokens


def word_ngrams(col: Column | str, n: int, distinct: bool = True) -> Column:
    """Word n-grams of a text column (space-joined), empty when the
    document has fewer than ``n`` tokens. ``distinct=False`` keeps
    multiplicities (needed by repetition profiling).

    The short-document case must be gated explicitly: Spark's
    ``sequence(1, 0)`` generates a DESCENDING [1, 0] (step inference),
    whose 0 then crashes ``slice`` — found by the hypothesis property
    suite, invisible on corpora where every document is long."""
    toks = tokens(col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams) if distinct else grams


def ngram_overlap(
    corpus: DataFrame,
    eval_set: DataFrame,
    corpus_id: str,
    corpus_text: str,
    eval_id: str,
    eval_text: str,
    n: int = 8,
) -> DataFrame:
    """(corpus doc, eval doc, shared n-gram count) for every colliding
    pair. Callers drop / review corpus docs appearing here. The eval
    side is broadcast — benchmarks are small by nature, so the corpus
    scan proceeds shuffle-free."""
    c = corpus.select(
        F.col(corpus_id).alias("doc_id"),
        F.explode(word_ngrams(corpus_text, n)).alias("gram"),
    )
    e = eval_set.select(
        F.col(eval_id).alias("eval_id"),
        F.explode(word_ngrams(eval_text, n)).alias("gram"),
    )
    return (
        c.join(F.broadcast(e), "gram")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


def contamination_fraction(
    corpus: DataFrame,
    eval_set: DataFrame,
    corpus_id: str,
    corpus_text: str,
    eval_text: str,
    n: int = 8,
    flag_threshold: float = 0.05,
    round_digits: int = 6,
) -> DataFrame:
    """Per-corpus-document contamination RATE: the fraction of the
    document's distinct word n-grams that appear anywhere in the eval
    set — the number a decontamination policy actually thresholds on
    (pair counts from :func:`ngram_overlap` say WHO collides; this says
    HOW MUCH of each document is benchmark material, separating a
    quoted sentence from a wholesale copy).

    Output: ``(doc_id, n_grams, n_contaminated, contaminated_frac,
    flagged)`` — one row per corpus document with at least one n-gram
    (docs shorter than ``n`` tokens have no n-grams and are absent; a
    policy treats them as clean by construction).

    Scale shape: the eval side collapses to its DISTINCT n-gram SET
    (benchmarks are small — broadcasts), and the corpus side is ONE
    explode + ONE broadcast left join + ONE per-doc aggregate: the
    hit count and the total ride the same pass, so the fact is
    scanned once and never shuffled except for the per-doc collapse
    (map-side combined, keyed by the unskewed doc id).
    """
    c = corpus.select(
        F.col(corpus_id).alias("doc_id"),
        F.explode(word_ngrams(corpus_text, n)).alias("gram"),
    )
    ev = (
        eval_set.select(F.explode(word_ngrams(eval_text, n)).alias("gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per = (
        c.join(F.broadcast(ev), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
    )
    frac = F.round(
        F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double"),
        round_digits,
    )
    return per.select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        frac.alias("contaminated_frac"),
        F.when(frac >= flag_threshold, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("flagged"),
    )
