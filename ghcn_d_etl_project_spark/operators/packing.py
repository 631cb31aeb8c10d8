"""Sequence packing: fill fixed-token-budget training sequences with
variable-length documents — the batch-prep step between a curated
corpus (``pipelines/corpus.py`` chunks) and a pre-training run, where
unpacked short documents waste the context window as padding (typical
corpora pad 30-60% without packing; packed, under 5%).

Bin packing is NP-hard and inherently sequential in its classical
greedy forms, so the scale design mirrors the engine's other
sequential-algorithm operators (isotonic, MMR): make the DISTRIBUTED
part honest and bound the sequential part.

  * Documents hash into ``n_buckets`` deterministic md5 buckets (the
    house ``hash_split_bucket`` recipe — engine/partitioning/run
    stable). Each bucket packs INDEPENDENTLY: one shuffle on the
    bucket key, sequential work bounded by ``n_docs / n_buckets``, and
    the bucket count scales with the cluster, not the data.
  * Within a bucket: first-fit-decreasing (FFD) via ``applyInPandas``
    — docs sorted (n_tokens DESC, id ASC — the tiebreak that makes the
    result a pure function of the bucket's contents), each placed into
    the first open sequence with room, else a new sequence. FFD uses
    at most 11/9 OPT + 6/9 sequences per bucket (Dósa 2007), so the
    padding waste bound is a theorem, not a hope.
  * Bucketing costs packing efficiency only at the margin: each bucket
    wastes at most one partially-filled trailing sequence, so the
    overhead vs global FFD is bounded by ``n_buckets`` sequences total
    — noise at corpus scale, and the price of parallelism.

Documents LONGER than the budget are emitted as singleton sequences
flagged ``truncate=1`` (the caller's tokenizer truncates); packing
never silently drops or splits them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_buckets: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Assign each document to a packed training sequence.

    Output: one row per input document —
    ``(id, n_tokens, bucket, seq, seq_id, truncate)`` where ``seq`` is
    the bucket-local sequence ordinal, ``seq_id`` the globally unique
    ``bucket * 2^32 + seq``, and ``truncate=1`` marks docs longer than
    the budget (alone in their sequence). Rows with NULL id or NULL /
    non-positive token counts are excluded (a 0-token doc contributes
    nothing to a sequence and would only create degenerate members).

    Determinism: bucket = md5 recipe of the id; within-bucket packing
    is a pure function of the bucket's (n_tokens, id) multiset — the
    whole assignment reproduces under any partitioning or re-run, so
    downstream epoch shuffles can key on ``seq_id`` safely.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    ident = F.col(id_col)
    toks = F.col(tokens_col).cast("long")
    hex8 = F.substring(
        F.md5(F.concat(ident.cast("string"), F.lit(":" + salt))), 1, 8
    )
    bucket: Column = F.conv(hex8, 16, 10).cast("long") % n_buckets
    base = df.filter(ident.isNotNull() & toks.isNotNull() & (toks > 0)).select(
        ident.alias("id"),
        toks.alias("n_tokens"),
        bucket.alias("bucket"),
    )

    schema = T.StructType(
        [
            base.schema["id"],
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bucket", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("truncate", T.LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        open_room: list[int] = []  # remaining tokens per open sequence
        seqs, trunc = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > budget:
                # overlong: singleton sequence, flagged, never reused
                seqs.append(len(open_room))
                open_room.append(0)
                trunc.append(1)
                continue
            for i, room in enumerate(open_room):
                if room >= n:
                    open_room[i] = room - n
                    seqs.append(i)
                    break
            else:
                seqs.append(len(open_room))
                open_room.append(budget - n)
            trunc.append(0)
        pdf["seq"] = pd.Series(seqs, dtype="int64")
        pdf["truncate"] = pd.Series(trunc, dtype="int64")
        return pdf

    packed = base.groupBy("bucket").applyInPandas(pack, schema)
    return packed.select(
        "id",
        "n_tokens",
        "bucket",
        "seq",
        (F.col("bucket") * F.lit(2**32) + F.col("seq")).alias("seq_id"),
        "truncate",
    )
