"""Product quantization (PQ) for embedding compression and ADC top-k —
the storage/scale path of the similarity-search family (Jégou et al.,
*Product Quantization for Nearest Neighbor Search*, TPAMI 2011): split
each D-dim vector into M subvectors, k-means each subspace
independently, store a vector as M small code ids (64 floats → 4
bytes here), and answer queries with asymmetric distance computation
(ADC) — per query one M×K lookup table, per candidate a sum of M table
lookups instead of a D-term float dot.

No reference analog (the reference has no vector surface); this is the
IVF companion: at 100 TB the corpus embeddings don't fit hot storage
uncompressed, so IVF partitions the candidate set and PQ shrinks what
each probe reads ~64×.

Determinism/exactness contract (same discipline as
``similarity.kmeans_cells``, taken one step further — EVERYTHING is
integer):
- coordinates quantize once: ``xq = floor(x · 2^20)`` as long;
- init: subspace codebooks seed from the ``k`` lowest-id vectors'
  subvector slices; the code id IS the seed vector's id (the
  ``kmeans_cells`` cell-id convention);
- assignment: integer squared L2 ``Σ (xq−cq)²`` (longs — order-free),
  argmin with ties to the smallest code id;
- update: ``cq = floor(sum/count)`` — floor of an exact rational;
- ADC: lookup tables and distances are the same integer sums.
So Spark and DuckDB agree bit-for-bit with no FP-order or
transcendental hazard anywhere, and results are invariant to input
partitioning.

Scale shape:
- quantize/slice is map-only (one posexplode — no raw-vector shuffle);
- training joins the exploded coords against a BROADCAST codebook
  (M·K·(D/M) = K·D rows — KBs), partial-aggregated before the only
  exchange, which carries reduced ``(id, m, code, partial)`` rows;
- codebooks pin to the driver between iterations (``_pin``) exactly
  like k-means centroids — KBs, cuts lineage replay;
- encode is one more broadcast-join pass; codes are M longs per
  vector — the 64× wire/storage win;
- ADC broadcasts the per-query LUTs (Q·M·K rows) against the CODES
  table only — the float corpus is never read at query time, which is
  the entire point of PQ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gush_spark.operators.similarity import KMEANS_QUANT

PQ_M = 4  # subspaces
PQ_K = 16  # codes per subspace


def _subcoords(
    vectors: DataFrame, id_col: str, vec_col: str, subdim: int
) -> DataFrame:
    """Map-only ``(id, m, pos, xq)``: subspace index, position within
    the subspace, floor-quantized coordinate."""
    return vectors.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("_p", "_x"),
    ).select(
        F.col(id_col),
        F.expr(f"_p div {subdim}").cast("long").alias("m"),
        (F.col("_p") % subdim).cast("long").alias("pos"),
        F.floor(F.col("_x").cast("double") * KMEANS_QUANT).alias("xq"),
    )


def _assign(sub: DataFrame, codebook: DataFrame, id_col: str) -> DataFrame:
    """Nearest code per (vector, subspace) by integer squared L2 —
    ``(id, m, code)``. Codebook is broadcast; the diff-square partials
    combine map-side before the (id, m, code)-keyed exchange."""
    d = F.col("xq") - F.col("cq")
    return (
        sub.join(F.broadcast(codebook), ["m", "pos"])
        .groupBy(id_col, "m", "code")
        .agg(F.sum(d * d).alias("_d"))
        .groupBy(id_col, "m")
        .agg(
            F.min_by(
                "code", F.struct(F.col("_d"), F.col("code"))
            ).alias("code")
        )
    )


def pq_train(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 1,
    dim: int | None = None,
) -> DataFrame:
    """Train the M per-subspace codebooks → ``(m, code, pos, cq)``
    (long-form, quantized-long coords; K·D rows total — broadcast it).
    ``dim`` defaults to the first vector's length (one tiny action).
    Train on a sample at crawl scale; encoding the full corpus is the
    same broadcast join."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    subdim = dim // m
    spark = vectors.sparkSession
    sub = _subcoords(vectors, id_col, vec_col, subdim).persist()

    def _pin(cdf: DataFrame) -> DataFrame:
        rows = cdf.collect()
        return spark.createDataFrame(rows, cdf.schema)

    seed_ids = vectors.select(F.col(id_col)).orderBy(id_col).limit(k)
    codebook = _pin(
        sub.join(F.broadcast(seed_ids), id_col)
        .select(F.col(id_col).alias("code"), "m", "pos", F.col("xq").alias("cq"))
    )
    for _ in range(iters):
        assigned = _assign(sub, codebook, id_col)
        codebook = _pin(
            sub.join(assigned, [id_col, "m"])
            .groupBy("m", "code", "pos")
            .agg(F.sum("xq").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .select(
                "m", "code", "pos",
                F.floor(F.col("_s") / F.col("_n")).alias("cq"),
            )
        )
    sub.unpersist()
    return codebook


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    dim: int | None = None,
) -> DataFrame:
    """Encode every vector against a trained codebook →
    ``(id, m, code)`` long-form PQ codes (M rows per vector)."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    n_m = codebook.select(F.max("m")).first()[0] + 1
    sub = _subcoords(vectors, id_col, vec_col, dim // n_m)
    return _assign(sub, codebook, id_col)


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Asymmetric-distance top-``k``: per query build the M×K integer
    LUT (exact squared L2 from the RAW query to every centroid), then
    score every encoded vector as the sum of M lookups —
    ``(query_id, neighbor_id, adc_dist, rank)``, nearest first, ties to
    the smallest neighbor id.

    The float corpus is never touched: the only corpus-sized input is
    the CODES table, joined against the broadcast LUTs and reduced to
    ``(query, id, partial-sum)`` before its exchange. Queries ride the
    same quantization as training, so the distances are exact integers
    both engines can reproduce."""
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    n_m = codebook.select(F.max("m")).first()[0] + 1
    qsub = _subcoords(queries, id_col, vec_col, dim // n_m).select(
        F.col(id_col).alias("query_id"), "m", "pos", F.col("xq").alias("qq")
    )
    d = F.col("qq") - F.col("cq")
    lut = (
        qsub.join(F.broadcast(codebook), ["m", "pos"])
        .groupBy("query_id", "m", "code")
        .agg(F.sum(d * d).alias("_d"))
    )
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("_d").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivfpq_build(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_cells: int = 8,
    cell_iters: int = 1,
    m: int = PQ_M,
    k_pq: int = PQ_K,
    pq_iters: int = 1,
    dim: int | None = None,
    spread: int | None = 0,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The write-once IVF-PQ index build: train the coarse quantizer,
    assign cells, PQ-train on residuals, encode. Returns
    ``(assignments, centroids, codebook, codes)`` — at real scale these
    are materialized tables (codes/assignments M+1 longs per vector;
    centroids/codebook driver-pinned KBs), amortized over every query;
    the bench times this separately from the probe path for exactly
    that reason."""
    from gush_spark.operators.similarity import kmeans_cells

    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    assignments, centroids = kmeans_cells(
        vectors, id_col, vec_col,
        n_cells=n_cells, iters=cell_iters, assign_quantized=True,
        spread=spread,
    )
    assignments = assignments.persist()
    res = (
        vectors.join(assignments, id_col)
        .join(F.broadcast(centroids), "cell")
        .select(
            F.col(id_col),
            F.zip_with(
                vec_col, "rep_vec", lambda a, b: a.cast("double") - b
            ).alias("_res"),
        )
    )
    # the residual join is the ONE place the embedding payload crosses
    # an exchange — the vec_id-keyed co-location that builds the index
    # (write-once, amortized over every query; audit pins that no
    # OTHER exchange carries vectors). Persisted: training and encode
    # both read it, and at real scale it would be a materialized table.
    res = res.persist()
    cb = pq_train(res, id_col, "_res", m=m, k=k_pq, iters=pq_iters, dim=dim)
    codes = pq_encode(res, cb, id_col, "_res", dim=dim)
    return assignments, centroids, cb, codes


def ivfpq_query(
    assignments: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    m: int = PQ_M,
    n_probe: int = 2,
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """The probe/ADC half of IVF-PQ against a built (possibly
    materialized-and-reloaded) index: each query picks its ``n_probe``
    best cells by centroid dot, builds per-(query, cell) residual LUTs,
    and scores ONLY those cells' codes — the float corpus is never
    read."""
    from gush_spark.operators.similarity import KMEANS_QUANT as _Q, l2_norm

    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    subdim = dim // m
    cb = codebook

    # probe: same normalized-centroid integer dot as the assignment,
    # top n_probe cells per query (descending score, ties to cell id)
    cn = centroids.select(
        "cell",
        F.posexplode(
            F.transform(
                F.col("rep_vec"),
                lambda x: F.floor(x / l2_norm(F.col("rep_vec")) * F.lit(_Q)),
            )
        ).alias("pos", "cnq"),
    )
    qex = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * _Q).cast("long"),
            )
        ).alias("pos", "aq"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("_s").desc(), F.col("cell")
    )
    probe = (
        qex.join(F.broadcast(cn), "pos")
        .groupBy("query_id", "cell")
        .agg(F.sum(F.col("aq") * F.col("cnq")).alias("_s"))
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "cell")
    )

    # per-(query, probed cell) residual LUT
    qres = (
        probe.join(F.broadcast(centroids), "cell")
        .join(
            queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
            "query_id",
        )
        .select(
            "query_id",
            "cell",
            F.zip_with(
                vec_col, "rep_vec", lambda a, b: a.cast("double") - b
            ).alias("_qres"),
        )
        .select("query_id", "cell", F.posexplode("_qres").alias("_p", "_x"))
        .select(
            "query_id",
            "cell",
            F.expr(f"_p div {subdim}").cast("long").alias("m"),
            (F.col("_p") % subdim).cast("long").alias("pos"),
            F.floor(F.col("_x") * _Q).alias("qq"),
        )
    )
    d = F.col("qq") - F.col("cq")
    lut = (
        qres.join(F.broadcast(cb), ["m", "pos"])
        .groupBy("query_id", "cell", "m", "code")
        .agg(F.sum(d * d).alias("_d"))
    )
    scored = (
        codes.join(assignments, id_col)
        .join(F.broadcast(lut), ["cell", "m", "code"])
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("_d").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_cells: int = 8,
    cell_iters: int = 1,
    m: int = PQ_M,
    k_pq: int = PQ_K,
    pq_iters: int = 1,
    n_probe: int = 2,
    k: int = 5,
    dim: int | None = None,
    spread: int | None = 0,
) -> DataFrame:
    """IVF-PQ top-``k`` — the FAISS-style composition and the 100 TB
    similarity-search answer: the coarse k-means quantizer
    (``similarity.kmeans_cells``, quantized codegen assignment)
    partitions the corpus into cells; vectors PQ-encode their RESIDUAL
    from the cell centroid (residuals are small, so the same code
    budget quantizes them far more finely than raw coords); a query
    probes its ``n_probe`` best cells and scores ONLY their members via
    per-(query, cell) ADC lookup tables.

    Output ``(query_id, neighbor_id, adc_dist, rank)`` — integer
    distances, nearest first, ties to the smallest id, candidates
    limited to probed cells (IVF recall semantics, like ``ivf_topk``).

    Determinism: cell probing reuses the assignment's integer-dot
    score (monotone in cosine); residuals are ``x − rep`` in doubles
    (one exact IEEE subtraction per coord) then floor-quantized, so
    training/encode/LUT all stay in the integer regime — oracle
    hash-exact end to end.

    Scale shape: centroids and PQ codebooks are driver-pinned KBs; the
    corpus-side passes are the coarse assignment broadcast join, the
    residual broadcast join, and the code/LUT broadcast join — the
    float corpus is read once at index-BUILD time (``ivfpq_build``,
    write-once, amortized over every query) and NEVER at query time
    (``ivfpq_query``); queries only touch the (id, cell) +
    (id, m, code) tables (M+1 longs per vector). The bench times the
    two halves separately (BENCH ``ann_index`` section)."""
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    assignments, centroids, cb, codes = ivfpq_build(
        vectors, id_col, vec_col,
        n_cells=n_cells, cell_iters=cell_iters,
        m=m, k_pq=k_pq, pq_iters=pq_iters, dim=dim, spread=spread,
    )
    return ivfpq_query(
        assignments, centroids, cb, codes, queries, id_col, vec_col,
        m=m, n_probe=n_probe, k=k, dim=dim,
    )


def sq8_report(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar (int8) quantization audit — the 4× compression tier
    BELOW product quantization: each dimension d gets a linear
    [min_d, max_d] → {0..255} code, and the report quantifies what
    that costs per vector:

        (id, n_dims, sse, max_abs_err)

    SSE = Σ_d (v_d − dequant(quant(v_d)))², both error columns
    rounded to 9 places. Faiss's ``SQ8`` / Lucene's scalar-quantized HNSW use
    exactly this codec; a corpus whose sse is tiny relative to vector
    norms can run ANN on 1/4 the memory BEFORE reaching for pq.py's
    machinery — this report is the decision input.

    Float discipline (why this is hash-exact): per-dim min/max of
    doubles are EXACT selections; the quantize → dequantize → error
    chain is a fixed expression tree of IEEE ops evaluated per
    element; and the per-vector sum runs as an in-order FOLD over the
    dimension arrays (``F.aggregate`` ≡ DuckDB ``list_reduce``),
    never a row-order-dependent aggregate. Same discipline as the
    fold-based cosine oracles in queries_pipeline.

    Scale shape: the per-dim min/max table is dim-sized (KBs) —
    computed in one posexplode+agg pass, assembled into two arrays
    via sort_array(collect_list) on the DIM frame (bounded, never the
    corpus), and broadcast back; the report itself is then a map-only
    pass over the vectors. The corpus crosses zero exchanges."""
    dims = embeddings.select(
        id_col, F.posexplode(vec_col).alias("_d", "_v")
    )
    stats = dims.groupBy("_d").agg(
        F.min("_v").cast("double").alias("_mn"),
        F.max("_v").cast("double").alias("_mx"),
    )
    pinned = stats.agg(
        F.array_sort(
            F.collect_list(F.struct("_d", "_mn", "_mx"))
        ).alias("_s")
    ).select(
        F.expr("transform(_s, x -> x._mn)").alias("_mins"),
        F.expr("transform(_s, x -> x._mx)").alias("_maxs"),
    )
    joined = embeddings.crossJoin(F.broadcast(pinned))
    # quant(i) = clamp(floor((v-mn)*255/(mx-mn))); degenerate dims
    # (mx == mn) code to 0 and dequantize back to mn exactly.
    err = (
        "transform(sequence(0, size({v}) - 1), i -> "
        "  CAST({v}[i] AS DOUBLE) - ("
        "    _mins[i] + (CASE WHEN _maxs[i] = _mins[i] THEN 0.0D ELSE "
        "      least(255.0D, greatest(0.0D, floor(((CAST({v}[i] AS DOUBLE) - _mins[i]) * 255.0D) / (_maxs[i] - _mins[i])))) "
        "    END) * (_maxs[i] - _mins[i]) / 255.0D"
        "  ))"
    ).format(v=vec_col)
    return joined.select(
        id_col,
        F.size(vec_col).cast("long").alias("n_dims"),
        F.round(
            F.expr(
                f"aggregate({err}, 0.0D, (acc, e) -> acc + e * e)"
            ),
            9,
        ).alias("sse"),
        F.round(
            F.expr(
                f"aggregate({err}, 0.0D, (acc, e) -> greatest(acc, abs(e)))"
            ),
            9,
        ).alias("max_abs_err"),
    )


def sq8_dim_stats(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension health card over the SQ8 code space — the
    dimension-collapse detector run before trusting an embedding
    column to ANN/SemDeDup:

        (dim, n_vecs, mn, mx, n_distinct_codes, sum_code,
         sum_code_sq, code_var)

    A healthy embedding spreads each dimension across many codes; a
    collapsed dimension (every vector ~identical there) shows
    n_distinct_codes ≈ 1 and code_var ≈ 0 — and contributes nothing
    to any distance, so it can be dropped from the codec. Working on
    the int8 CODES instead of raw floats is what makes the statistics
    engine-exact AND order-free: sum and sum-of-squares of codes are
    BIGINT aggs (no float summation order to disagree on), and the
    variance is derived from those two exact integers in one fixed
    double expression. (Code variance ≈ value variance scaled by
    (range/255)² — the audit signal is identical.) Overflow honesty:
    sum_code_sq exceeds 2^53 around 1.4·10^12 rows; shard the audit
    or widen to DECIMAL there.

    Scale shape: one posexplode pass for the dim-stat table (KBs,
    broadcast back), one more for the code agg — both map-side
    combinable, keyed by the 64-ish dim frame; the corpus never
    shuffles."""
    d = embeddings.select(
        id_col, F.posexplode(vec_col).alias("_d", "_v")
    )
    st = d.groupBy("_d").agg(
        F.min("_v").cast("double").alias("_mn"),
        F.max("_v").cast("double").alias("_mx"),
    )
    j = d.join(F.broadcast(st), on="_d")
    code = (
        F.when(F.col("_mx") == F.col("_mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(255.0),
                F.greatest(
                    F.lit(0.0),
                    F.floor(
                        (
                            (F.col("_v").cast("double") - F.col("_mn"))
                            * F.lit(255.0)
                        )
                        / (F.col("_mx") - F.col("_mn"))
                    ),
                ),
            )
        )
        .cast("long")
    )
    coded = j.select(
        F.col("_d").cast("long").alias("dim"), "_mn", "_mx", code.alias("_c")
    )
    return (
        coded.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("_mn").alias("mn"),
            F.max("_mx").alias("mx"),
            F.countDistinct("_c").cast("long").alias("n_distinct_codes"),
            F.sum("_c").cast("long").alias("sum_code"),
            F.sum(F.col("_c") * F.col("_c")).cast("long").alias("sum_code_sq"),
        )
        .withColumn(
            "code_var",
            F.round(
                F.col("sum_code_sq").cast("double") / F.col("n_vecs")
                - (F.col("sum_code").cast("double") / F.col("n_vecs"))
                * (F.col("sum_code").cast("double") / F.col("n_vecs")),
                9,
            ),
        )
    )


def pq_adc_rerank_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    r: int = 20,
    k: int = 5,
    dim: int | None = None,
) -> DataFrame:
    """Two-stage retrieval — the production PQ pattern (Jégou et al.
    §V): ADC over the compressed codes produces a cheap top-``r``
    shortlist, then the EXACT (quantized-integer) distance re-ranks
    only those ``r`` candidates into the final top-``k``:

        (query_id, neighbor_id, adc_dist, exact_dist, rank)

    ADC error is bounded by quantization distortion, so with r a few ×
    k the rerank recovers the exact ranking at a fraction of the cost:
    the corpus-sized scan touches CODES only (M lookups/candidate);
    full-dimension arithmetic happens on Q·r vectors.

    Scale shape: the shortlist ids (Q·r rows, KBs) broadcast into a
    semi-join that prunes the float corpus BEFORE any explode — the
    rerank never materializes corpus-wide coordinates, and the final
    window is over Q·r rows. Exactness: both distances are the repo's
    quantized-long squared L2 (order-free integer sums), so the oracle
    reproduces them bit-for-bit."""
    if dim is None:
        dim = len(queries.select(vec_col).first()[0])
    n_m = codebook.select(F.max("m")).first()[0] + 1
    subdim = dim // n_m
    coarse = pq_adc_topk(
        codes, codebook, queries, id_col=id_col, vec_col=vec_col,
        k=r, dim=dim,
    ).select("query_id", "neighbor_id", "adc_dist")
    short_ids = coarse.select(
        F.col("neighbor_id").alias(id_col)
    ).distinct()
    cand = vectors.join(F.broadcast(short_ids), on=id_col, how="leftsemi")
    vsub = _subcoords(cand, id_col, vec_col, subdim).select(
        F.col(id_col).alias("neighbor_id"), "m", "pos", "xq"
    )
    qsub = _subcoords(queries, id_col, vec_col, subdim).select(
        F.col(id_col).alias("query_id"), "m", "pos", F.col("xq").alias("qq")
    )
    d = F.col("qq") - F.col("xq")
    exact = (
        coarse.join(vsub, on="neighbor_id")
        .join(qsub, on=["query_id", "m", "pos"])
        .groupBy("query_id", "neighbor_id", "adc_dist")
        .agg(F.sum(d * d).cast("long").alias("exact_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("exact_dist"), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
    )
