"""Document chunking — fixed-size token windows with overlap (stride),
the window-prep step for embedding models and long-context pretraining:
each document becomes ceil((n - chunk)/stride)+1 chunks of
``chunk_tokens`` whitespace tokens, consecutive chunks overlapping by
``chunk_tokens - stride`` tokens so no boundary context is lost.

The complement of sequence packing (operators/packing.py): packing
CONCATENATES short docs up to a budget; chunking SPLITS long docs down
to one. A training-data pipeline runs both — pack the short tail,
chunk the long head.

Scale design: pure JVM expressions, map-only, ZERO shuffle — the chunk
index explodes from a ``sequence()`` bounded per row, and each chunk is
a ``slice()`` of the (bound-once) words array; output volume is
``~n_tokens/stride`` rows per doc, linear in corpus size. No window
function, no sort, no state — this runs as a projection on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gush_spark.functions.text_analysis import words_of


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Output: ``id_col``, ``chunk_id`` (0-based, in token order),
    ``start_token`` (offset of the chunk's first token),
    ``n_chunk_tokens`` (== chunk_tokens except the final remainder),
    ``chunk_text`` (the window re-joined with single spaces — chunking
    operates on the normalized token stream, same convention as every
    token-level operator here).

    A document with fewer than ``chunk_tokens`` tokens yields exactly
    one chunk (itself). NULL text yields no chunks (the error-channel
    convention: error rows are handled upstream; ``sequence(null)``
    explodes to nothing rather than poisoning the batch).
    """
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    if stride > chunk_tokens:
        raise ValueError(
            f"stride={stride} > chunk_tokens={chunk_tokens} would leave "
            "tokens covered by NO chunk — the every-token-covered "
            "contract forbids gaps"
        )
    ws = words_of(F.col(text_col))
    # bind the words array once: every downstream expression references
    # the materialized column, not the normalize/split chain
    bound = df.select(F.col(id_col), ws.alias("_ws")).select(
        id_col, "_ws", F.size(F.col("_ws")).alias("_n")
    )
    n = F.col("_n")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / stride).cast("long") + 1
    )
    exploded = bound.select(
        id_col,
        "_ws",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    start = F.col("chunk_id") * stride
    chunk = F.slice(F.col("_ws"), start + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_token"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
