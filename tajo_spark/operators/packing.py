"""Sequence packing: bin documents into fixed token budgets.

Training pipelines pack variable-length documents into fixed-size
training sequences (max_tokens per sequence) to avoid padding waste.
Exact global bin packing is inherently sequential, so the scalable
variant packs greedily WITHIN hash partitions:

  repartition(id)            → layout depends on data, not input split
  sortWithinPartitions(id)   → deterministic arrival order
  mapInPandas(greedy packer) → streaming next-fit per partition

Pack ids are globally unique without coordination:
``partition_id * 2^40 + local ordinal``. A document longer than the
budget becomes a singleton pack flagged ``oversize`` (the caller
decides whether to truncate or drop).

Scale: one shuffle (the repartition) sized by the doc-id hash — even
at 100 TB each partition packs independently with O(1) state (the one
open pack); the Arrow batch size bounds Python-side memory, and no
driver-side state exists. Packing quality vs the sequential oracle is
the usual next-fit bound; at corpus scale per-partition fill rates
are statistically identical to global packing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = (
    "doc_id BIGINT, n_tokens BIGINT, pack_id BIGINT, pack_pos INT, "
    "oversize BOOLEAN"
)

_PID_SHIFT = 1 << 40


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, pack_id, pack_pos, oversize) assignments."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")

    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    parted = (
        base.repartition(num_partitions, "doc_id")
        if num_partitions
        else base.repartition("doc_id")
    ).sortWithinPartitions("doc_id").withColumn(
        "pid", F.spark_partition_id()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one open pack per partition; state persists across Arrow
        # batches of the same partition (mapInPandas iterates them
        # in order within one task)
        pack_ord, fill, pos = -1, 0, 0
        for batch in batches:
            if not len(batch):
                continue
            out = []
            for doc_id, toks, pid in zip(
                batch["doc_id"], batch["n_tokens"], batch["pid"]
            ):
                toks = int(toks)
                oversize = toks > max_tokens
                if oversize or pack_ord < 0 or fill + toks > max_tokens:
                    pack_ord += 1
                    fill, pos = 0, 0
                out.append(
                    (
                        int(doc_id),
                        toks,
                        int(pid) * _PID_SHIFT + pack_ord,
                        pos,
                        oversize,
                    )
                )
                fill += toks
                pos += 1
                if oversize:
                    # singleton: force the next doc into a new pack
                    fill = max_tokens + 1
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "n_tokens", "pack_id", "pack_pos", "oversize",
                ],
            )

    return parted.mapInPandas(run, schema=PACK_SCHEMA)
