"""Sequence packing: concat-and-chunk documents into fixed token-budget
training sequences, deterministically and shard-parallel.

LLM training consumes fixed-length sequences, not documents; the
standard prep step concatenates documents in a stable order and slices
the token stream every ``budget`` tokens (docs may straddle a
boundary). A naive implementation is a global sequential scan; the
distributed form here shards the corpus by content hash — each shard
is an independent packing unit, so the only per-shard dependency is a
window cumsum and shards scale out linearly with the cluster. This is
how 100 TB tokenization runs stay embarrassingly parallel: sequence
ids are (shard, seq_in_shard), never a global counter.

Determinism: the shard and the in-shard order derive from the md5-based
``h32`` of the document key (see ``operators.sampling``) — the same doc
lands at the same offset on every run, engine, and partitioning, which
is what makes packed runs resumable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import h32, token_count


def pack_sequences(
    docs: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 512,
    n_shards: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Assign every document a (shard, seq_id, crosses_boundary) packing
    position.

    ``seq_id`` is the sequence holding the document's FIRST token
    (concat-and-chunk: long docs spill into following sequences —
    ``crosses_boundary`` flags them). All integer arithmetic on exact
    token counts, so positions are bit-identical everywhere.

    Scale: one shuffle (hash-partition by shard) + an in-shard sort for
    the window; shard count is the parallelism knob. No global barrier,
    no driver state."""
    h = h32(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = (
        Window.partitionBy("shard")
        .orderBy("h", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("h", h)
        .withColumn("shard", F.col("h") % n_shards)
        .withColumn("n_tok", token_count(F.col(text_col)).cast("long"))
        .withColumn("tok_end", F.sum("n_tok").over(w))
        .withColumn(
            "seq_id", F.floor((F.col("tok_end") - F.col("n_tok")) / budget)
        )
        .withColumn(
            "crosses_boundary",
            F.floor((F.col("tok_end") - 1) / budget) != F.col("seq_id"),
        )
        .drop("h")
    )


def pack_stats(packed: DataFrame, budget: int = 512) -> DataFrame:
    """Per-shard packing summary: docs, tokens, sequences produced
    (``ceil(tokens/budget)`` — counts spill-covered sequences a
    start-id distinct-count would miss), and boundary crossers."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            (F.floor((F.sum("n_tok") - 1) / budget) + 1).alias("n_seqs"),
            F.sum(F.col("crosses_boundary").cast("bigint")).alias("n_crossers"),
        )
        .orderBy("shard")
    )
