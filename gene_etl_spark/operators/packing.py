"""Sequence packing: fill fixed-size context windows with documents —
the sample-packing step between a cleaned corpus and a training run.

Packing is inherently sequential (bin state), so it cannot be a pure
column expression; the distributed decomposition is the standard one:

1. shard documents deterministically into packer groups (key-hash, so
   the layout is reproducible and groups are balanced);
2. each group packs ITS documents greedily (first-fit-decreasing over a
   deterministic order) inside one Arrow batch — state never crosses a
   group boundary, so groups parallelize perfectly;
3. bin ids interleave (local_bin * num_groups + group) — globally
   unique without coordination and without any per-group bin-count
   ceiling (a fixed bit-shift scheme would silently collide once a
   group packs more bins than the shift allows).

Packing quality costs only at group boundaries (each group wastes at
most its own tail bins); with thousands of groups over billions of
documents the fill-rate loss vs a single global packer is negligible,
while a global packer would serialize the corpus through one node.
Oversized documents (> window) are emitted alone in a single bin,
flagged, so the caller can truncate/split them downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gene_etl_spark.operators.sampling import sample_hash

PACK_SCHEMA = T.StructType(
    [
        T.StructField("bin_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("bin_fill", T.LongType()),
        T.StructField("oversize", T.BooleanType()),
    ]
)

def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    doc_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_groups: int = 64,
    seed: int = 0,
) -> DataFrame:
    """Assign every document to exactly one bin of capacity
    ``max_tokens``. Returns (bin_id, doc_id, n_tokens, bin_fill,
    oversize): one row per document, ``bin_fill`` repeated per bin for
    convenience. Deterministic for a given (corpus, max_tokens,
    num_groups, seed)."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")

    grouped = docs.select(
        F.col(doc_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.pmod(sample_hash(doc_col, seed, "xxhash64"), F.lit(num_groups))
        .cast("int")
        .alias("_grp"),
    )

    def pack_group(pdf):
        import bisect

        import pandas as pd

        grp = int(pdf["_grp"].iloc[0])
        # best-fit-decreasing over a deterministic order (size desc,
        # doc_id asc — reproducible regardless of arrival order). Open
        # bins are kept as a capacity-sorted list, so each placement is
        # a bisect for the TIGHTEST bin that fits: O(n log n)-ish per
        # group instead of FFD's linear scan per document (quadratic
        # when a group holds millions of docs), with the same ≤11/9·OPT
        # packing bound. Ties on capacity break by bin id (bisect key
        # includes it), keeping the layout fully deterministic.
        rows = sorted(
            zip(pdf["doc_id"].tolist(), pdf["n_tokens"].tolist()),
            key=lambda t: (-t[1], t[0]),
        )
        n_bins = 0
        open_bins: list[tuple[int, int]] = []  # (remaining, bin_id), sorted
        assign: list[tuple[int, int, int, bool]] = []
        for doc_id, n in rows:
            if n > max_tokens:  # oversized: alone in its own bin, flagged
                assign.append((n_bins, doc_id, n, True))
                n_bins += 1
                continue
            # tightest open bin with remaining >= n
            i = bisect.bisect_left(open_bins, (n, -1))
            if i < len(open_bins):
                rem, b = open_bins.pop(i)
                new_rem = rem - n
                if new_rem > 0:
                    bisect.insort(open_bins, (new_rem, b))
                assign.append((b, doc_id, n, False))
            else:
                b = n_bins
                n_bins += 1
                rem = max_tokens - n
                if rem > 0:
                    bisect.insort(open_bins, (rem, b))
                assign.append((b, doc_id, n, False))
        fill = {}
        for b, _doc, n, _o in assign:
            fill[b] = fill.get(b, 0) + n
        # interleaved global id: unique across groups for ANY bin count
        # (no 2^k-bins-per-group ceiling a shift scheme would impose)
        return pd.DataFrame(
            {
                "bin_id": [b * num_groups + grp for b, _d, _n, _o in assign],
                "doc_id": [d for _b, d, _n, _o in assign],
                "n_tokens": [n for _b, _d, n, _o in assign],
                "bin_fill": [fill[b] for b, _d, _n, _o in assign],
                "oversize": [o for _b, _d, _n, o in assign],
            }
        )

    return grouped.groupBy("_grp").applyInPandas(pack_group, PACK_SCHEMA)
