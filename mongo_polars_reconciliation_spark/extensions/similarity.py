"""Similarity search over embedding columns (array<float>).

Cosine arithmetic fixes the IEEE operation order (left fold), making every
score bit-reproducible across engines (DuckDB's ``list_reduce`` mirrors it
exactly). Two interchangeable implementations produce those identical
doubles: built-in higher-order functions (``zip_with`` + ``aggregate``,
JVM-side) and Arrow-batched numpy kernels that vectorize ACROSS rows while
keeping the per-row scalar op sequence (sequential per-dimension
accumulation — never ``np.sum``/BLAS, which reorder additions). The Arrow
kernels are the default hot path: r7 interleaved A/B at sf0.1 measured the
expression path dominated by Catalyst ANALYSIS of the huge literal-centroid
trees (nlist×dim fold lambdas ≈ 10k nodes), not compute —
knn_join_multiprobe 7.11→2.96 s min, semantic_dedup_fitted 6.15→2.28 s
with the kernels. Centroid averaging routes per-dimension sums through
DECIMAL so shuffle order can't change the result.

Scale paths:
- brute-force top-k: one broadcast of the query vector, one pass, one
  top-k window — the 100 TB plan is a full scan, which is the correct
  baseline for exact search;
- IVF: centroids per partition label (k-means assignments at scale; the
  ``label`` column here), probe the closest ``nprobe`` centroids, search
  only those partitions — the scan shrinks by ~nprobe/nlist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mongo_polars_reconciliation_spark.functions.windows import single_partition_key


def _fold_sum(arr: Column) -> Column:
    """Left-fold sum: deterministic IEEE order (0.0 + x0 + x1 + ...)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _pair_dot_kernel_py(va, vb):
    """Arrow-vectorized pair dot product with the EXACT left-fold IEEE
    order of ``_fold_sum(zip_with(va, vb, *))``: the accumulator starts
    at 0.0 and adds one per-dimension product at a time — sequential in
    the dimension, vectorized ACROSS the batch (``acc += a[:,j]*b[:,j]``)
    — so every pair sees the scalar op sequence
    ``((0.0 + a0·b0) + a1·b1) + ...`` bit-for-bit, and the DuckDB
    ``list_reduce`` mirror stays exact. Never ``np.sum``/BLAS here: both
    reorder additions (pairwise summation / dgemm) and break the
    cross-engine bit parity the oracles pin.

    Why a Python-side kernel in a repo that bans row Python in hot paths:
    the blocked self-joins score ~n·block_size pairs through an
    INTERPRETED Catalyst fold (128 expression-tree evaluations per pair
    at dim=64); VERDICT r6 named it the top remaining perf lever and
    sanctioned Pandas-over-Arrow for exactly this surface. The unrolled
    ``GetArrayItem`` codegen alternative measured ~40% SLOWER in r6
    (memory: spark-perf-lessons); this kernel is the measured winner.

    r7 interleaved A/B at sf0.1 (mins of 3 reps, one session): with the
    assignment kernel also on, sim_knn_join_multiprobe 7.11→2.96 s and
    sim_semantic_dedup_fitted 6.15→2.28 s. On the small label-block
    queries the pair counts are low enough that the Python-worker
    round-trip floor eats the win (sim_knn_join 2.40→2.10,
    sim_semantic_dedup 1.43→1.54, dedup_embedding_cosine 1.41→1.47 —
    the latter two inside noise); kept on everywhere for one code path,
    with ``PAIR_DOT_ARROW=False`` restoring the fold."""
    import numpy as np
    import pandas as pd

    if len(va) == 0:
        return pd.Series([], dtype="float64")
    a = np.stack(va.to_numpy())
    b = np.stack(vb.to_numpy())
    acc = np.zeros(a.shape[0], dtype=np.float64)
    for j in range(a.shape[1]):
        acc = acc + a[:, j] * b[:, j]
    return pd.Series(acc)


# A/B hook (bench-noise discipline: interleave implementations in ONE
# session when measuring). True = Arrow kernel, False = interpreted fold.
PAIR_DOT_ARROW = True

# The pandas_udf wrapper is built lazily: the decorator parses its return
# type through the active SparkContext, so a module-level decoration would
# make `import similarity` require a running session.
_PAIR_DOT_UDF = None


def _pair_dot(va: Column, vb: Column) -> Column:
    """Dot product of two array<double> pair columns; both implementations
    produce bit-identical doubles (same scalar IEEE op order)."""
    global _PAIR_DOT_UDF
    if PAIR_DOT_ARROW:
        if _PAIR_DOT_UDF is None:
            from pyspark.sql.types import DoubleType

            _PAIR_DOT_UDF = F.pandas_udf(_pair_dot_kernel_py, DoubleType())
        return _PAIR_DOT_UDF(va, vb)
    return _fold_sum(F.zip_with(va, vb, lambda x, y: x * y))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns via fold arithmetic."""
    dot = _fold_sum(F.zip_with(a, b, lambda x, y: x * y))
    na = F.sqrt(_fold_sum(F.zip_with(a, a, lambda x, y: x * y)))
    nb = F.sqrt(_fold_sum(F.zip_with(b, b, lambda x, y: x * y)))
    return dot / (na * nb)


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def topk_bruteforce(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast literal query vector, score every
    row, one top-k window. Ranking uses the 6-dp-rounded score with id
    tie-break so rank order is reproducible."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine(_as_double(vec_col), q), 6).alias("cos_r"),
    )
    # orderBy+limit plans as TakeOrderedAndProject: each partition computes a
    # local top-k and the driver merges k*parts rows — no global window (which
    # would funnel every scored row through one task). The rank window then
    # runs over just k rows.
    topk = scored.orderBy(F.col("cos_r").desc(), F.col(id_col).asc()).limit(k)
    # the window only ever sees the k limited rows; non-foldable constant
    # key keeps the WindowExec no-partition warning out of bench logs
    w = Window.partitionBy(single_partition_key()).orderBy(
        F.col("cos_r").desc(), F.col(id_col).asc()
    )
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(id_col, "rank", "cos_r")
    )


def label_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label per-dimension mean as (label, pos, cval) rows. Sums are
    DECIMAL-routed so the average is independent of aggregation order."""
    exploded = emb.select(
        F.col(label_col), F.posexplode(_as_double(vec_col)).alias("pos", "val")
    )
    return exploded.groupBy(label_col, "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cval")
    )


def _sq_dist(vcol: Column, cent: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, left-fold order — the
    same IEEE operation sequence as the SQL mirror, so both engines get
    bit-identical doubles."""
    arr = F.array(*[F.lit(float(x)) for x in cent])
    return _fold_sum(F.zip_with(vcol, arr, lambda x, y: (x - y) * (x - y)))


# A/B hook for the centroid-assignment implementation. True = Arrow
# kernel (one UDF node), False = literal-centroid Catalyst expressions.
# At sf0.1 the expression path's plan tree is ~10k nodes (nlist=32
# centroids × dim=64 fold lambdas) and ANALYSIS/codegen of that tree —
# not compute — dominated the fitted queries (measured r7: kmeans_fit
# 3.1 s + probe_assignments 2.7 s of the ~8 s total, vs 0.17 s for the
# actual pair join). The kernel collapses it to one node; same doubles.
ASSIGN_ARROW = True

# Centroids per distance block inside the assignment kernel: transient
# kernel memory is batch_rows × _ASSIGN_CHUNK doubles (~80 MB at the
# 10k-row Arrow default) however large nlist grows. Module-level so the
# chunk-merge path is testable with tiny chunks.
_ASSIGN_CHUNK = 1024


def _nearest_cids_udf(cents: list[list[float]], nprobe: int):
    """Build a pandas_udf mapping array<double> → the ``nprobe`` nearest
    centroid ids in (squared distance, cid) ascending order.

    Bit-parity contract: per-centroid distance uses the accumulator
    sequence ``((0.0 + t0²) + t1²) + ...`` (vectorized across the batch,
    sequential in the dimension) — the exact IEEE op order of
    :func:`_sq_dist`'s left fold — and a STABLE argsort on the distance
    ties by original column position, i.e. ascending cid, the exact
    ordering of ``array_sort`` over (d, cid) structs / ``least``. The
    DuckDB oracles replay the same arithmetic, so both implementations
    are interchangeable bit-for-bit (parity-tested)."""
    C = [[float(x) for x in c] for c in cents]
    # captured at build time (driver) so tests that shrink the chunk see
    # it inside worker processes — a module global read inside fn would
    # re-resolve against the worker's own import
    chunk = _ASSIGN_CHUNK

    def fn(v):
        import numpy as np
        import pandas as pd

        if len(v) == 0:
            return pd.Series([], dtype=object)
        a = np.stack(v.to_numpy())
        m, dim = a.shape
        carr = np.asarray(C, dtype=np.float64)
        rows = np.arange(m)[:, None]
        best_d = best_c = None
        # Vectorized across CENTROIDS per dimension (r8, advice item): the
        # old per-centroid Python loop was O(nlist·dim) numpy calls per
        # batch — fine at nlist=32, the bottleneck once auto_nlist grows
        # into the thousands. ``D = D + t*t`` on an (m, chunk) matrix does
        # the identical per-element IEEE accumulation (same j order, same
        # 0.0 seed), so bit-parity with _sq_dist's left fold is preserved.
        # Chunking bounds transient memory at m×chunk doubles; the chunk
        # merge keeps the (distance, cid) tie-break exactly because chunks
        # are processed in ascending-cid order and every candidate list is
        # already (d, cid)-sorted, so a STABLE argsort over concatenated
        # distances resolves ties to the lower cid.
        for lo in range(0, len(C), chunk):
            cc = carr[lo : lo + chunk]
            D = np.zeros((m, cc.shape[0]), dtype=np.float64)
            for j in range(dim):
                t = a[:, j][:, None] - cc[:, j][None, :]
                D = D + t * t
            idx = np.argsort(D, axis=1, kind="stable")[:, :nprobe]
            cand_d, cand_c = D[rows, idx], idx + lo
            if best_d is None:
                best_d, best_c = cand_d, cand_c
            else:
                all_d = np.concatenate([best_d, cand_d], axis=1)
                all_c = np.concatenate([best_c, cand_c], axis=1)
                sel = np.argsort(all_d, axis=1, kind="stable")[:, :nprobe]
                best_d, best_c = all_d[rows, sel], all_c[rows, sel]
        return pd.Series([row.tolist() for row in best_c.astype("int32")])

    from pyspark.sql.types import ArrayType, IntegerType

    return F.pandas_udf(fn, ArrayType(IntegerType()))


def cluster_assign(vcol: Column, cents: list[list[float]]) -> Column:
    """Nearest-centroid id for a vector column: argmin of squared distance
    with a deterministic cid tie-break, zero joins, zero shuffles.
    Centroids are k×dim doubles, broadcast-scale by construction. Arrow
    kernel by default (see ``ASSIGN_ARROW``); the ``least`` over
    (distance, cid) structs is the expression-path fallback — identical
    doubles either way."""
    if ASSIGN_ARROW:
        return F.element_at(_nearest_cids_udf(cents, 1)(vcol), 1)
    structs = [
        F.struct(_sq_dist(vcol, c).alias("d"), F.lit(i).cast("int").alias("cid"))
        for i, c in enumerate(cents)
    ]
    return F.least(*structs)["cid"]


def kmeans_fit(
    emb: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic DataFrame-native Lloyd fit; returns k×dim centroids.

    Init = the vectors of the ``k`` smallest ids (TakeOrderedAndProject —
    k rows to the driver, no global sort); each of the fixed ``n_iter``
    rounds is one full-scan projection (nearest-centroid via literal
    arrays, no join) plus one (cid, pos) hash-aggregate whose output is
    k×dim rows. Per-dimension means go through DECIMAL so shuffle order
    can't change a centroid bit. Empty clusters keep their previous
    centroid. The centroids never leave broadcast scale, so the loop's
    driver round-trips carry k×dim doubles, not data.

    A production alternative is ``pyspark.ml.clustering.KMeans`` with a
    fixed seed — this fold-exact form exists so the DuckDB oracle can
    replay the fit bit-for-bit (kmeans++ sampling cannot be mirrored).

    The (id, double-vector) projection is lineage-checkpointed once: the
    loop's 2·n_iter+1 actions would otherwise each re-read the parquet
    scan and re-run the cast projection, and the checkpoint also keeps
    the per-iteration plans leaf-shallow (the AQE re-analysis cost
    measured on the cascade)."""
    vecs = emb.select(
        F.col(id_col).alias("_kid"), _as_double(vec_col).alias("v")
    ).localCheckpoint(eager=False)
    init = vecs.orderBy("_kid").limit(k).collect()
    if not init:
        raise ValueError("kmeans_fit: input has no rows")
    # fewer rows than k: fit the clusters the data can support — the
    # update loop below indexes cents[c], so k must equal len(cents)
    cents = [list(r["v"]) for r in init]
    k = len(cents)
    dim = len(cents[0])
    for _ in range(n_iter):
        assigned = vecs.select(cluster_assign(F.col("v"), cents).alias("cid"), "v")
        rows = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("cval")
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["cval"]
        cents = [
            [by_cid[c][p] for p in range(dim)] if c in by_cid else cents[c]
            for c in range(k)
        ]
    return cents


# A/B hook for the driver-known-constant plumbing (r16 optimization
# round, guide §1.2 fixed per-job work). True = tiny driver-known tables
# become literal plan expressions — the centroid lookup in
# ivf_residuals, the per-cell LUTs in ivfpq_topk and the query-vector
# lookup in topk_ivf index constant arrays (one F.expr parse, see
# functions/localrel.py) instead of parallelize+broadcast-join frames —
# and artifact loads sort driver-side instead of via an orderBy
# exchange. False = the original parallelize/broadcast-join/orderBy
# forms. Identical doubles either way — pinned in
# tests/test_properties.py. (The literal-plan artifact WRITE was
# measured ~0.15 s slower than the single-slice parallelize write and
# rejected — see save_centroids.)
ARTIFACT_LOCAL_PLAN = True

# r17 size gate (VERDICT r16 #3): the per-cell LUT CASE in ivfpq_topk
# folds nprobe × m × ksub double literals into the plan. At model scale
# (the pinned geometry: 2 × 4 × 8 = 64 doubles) that is the measured
# win; past this budget the expression text itself would become a
# parser/analyzer cost, so larger geometries route to the broadcast
# lut_df form (bit-equal by the ARTIFACT_LOCAL_PLAN pin). 65536 doubles
# ≈ 1.4 MB of expression text — parse-trivial; anything beyond is no
# longer "model scale".
IVFPQ_LUT_LITERAL_MAX_DOUBLES = 65536


def save_centroids(spark, cents: list[list[float]], path: str) -> None:
    """Persist a fitted centroid table to parquet — the vector-side model
    artifact (r10, the ``bpe_save_merges`` treatment): a real pipeline
    fits ONCE and assigns/probes many corpora and ingest waves from the
    stored table, instead of re-running Lloyd per job. Schema is
    (cid int, c array<double>); parquet stores the doubles bit-exactly,
    so fit → save → load → assign is bit-identical to fit-then-assign
    (property-pinned). The table is nlist rows — driver/broadcast scale
    by construction (see ``auto_nlist``'s √n cap).

    The local relation is parallelized as ONE slice: the default
    createDataFrame splits driver rows across defaultParallelism python
    partitions and the write then pays a Python-worker round trip per
    slice — measured ~4 s for 32 rows at local[32] vs 0.3 s single-slice
    (and one slice means one output file, no coalesce needed). r16
    measured-and-rejected: an inline()-literal JVM write (no Python
    worker at all) ran ~0.15 s SLOWER warm — codegen of the k×dim-
    literal Generate costs more than the one worker round trip it
    saves — so the single-slice parallelize stays."""
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), "cid int, c array<double>"
    ).write.mode("overwrite").parquet(path)


def load_centroids(spark, path: str) -> list[list[float]]:
    """Load a :func:`save_centroids` artifact back into the k×dim list the
    assignment kernels close over. The collect is nlist rows — the same
    driver-scale round-trip ``kmeans_fit`` itself performs per Lloyd
    round, not a data collect. The cid sort runs driver-side over those
    nlist rows (r16): an ``orderBy`` here planned a range-partitioned
    sort (bounds-sampling job + exchange) to order rows a driver loop
    can order for free."""
    rows = spark.read.parquet(path).collect()
    rows.sort(key=lambda r: r["cid"])
    if not rows:
        raise ValueError(f"load_centroids: no centroid rows at {path}")
    if [r["cid"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"load_centroids: non-contiguous cid sequence at {path} — "
            "the artifact is corrupt or was written by something else"
        )
    return [list(r["c"]) for r in rows]


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    ksub: int = 8,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks (r10): split each vector into ``m``
    contiguous subspaces of dim/m dimensions and run the deterministic
    Lloyd fit of :func:`kmeans_fit` independently per subspace — returns
    ``books[m][ksub][dim/m]``. PQ is the canonical 100 TB ANN memory
    trade (FAISS's IVF-PQ layout): a 64-dim float vector becomes m small
    codes, so the candidate scan reads m bytes per row instead of the
    vector, and exact vectors are touched only for the re-rank survivors.

    r16 (optimization round, guide §1.2/§2.4): the ``m`` independent
    subspace fits are FUSED into one loop — one (id, double-vector)
    checkpoint instead of m, ONE init collect (the k smallest ids are the
    same rows for every subspace; slicing the collected vectors equals
    collecting the sliced projections), and per Lloyd round ONE job that
    assigns all m subspaces (m assignment-kernel nodes in a single
    projection, the :func:`pq_encode` shape) and aggregates the per-
    (subspace, cid, pos) DECIMAL means together. Bit-identical to the
    sequential per-subspace loop: elementwise double-cast commutes with
    slicing, each (s, cid, pos) group's decimal sum/count is exactly the
    per-subspace group's, and empty clusters keep their previous centroid
    per subspace (pinned fused ≡ sequential in tests/test_properties.py).
    Measured at sf0.1 (m=4, ksub=8, n_iter=1): 3.25 s → ~1 s warm — the
    old form paid m×(checkpoint + init collect + n_iter collects) driver
    round-trips; at scale it paid m full passes over the corpus per
    round where one suffices."""
    vecs = emb.select(
        F.col(id_col).alias("_kid"), _as_double(vec_col).alias("v")
    ).localCheckpoint(eager=False)
    init = vecs.orderBy("_kid").limit(ksub).collect()
    if not init:
        raise ValueError("pq_fit: input has no rows")
    dim = len(init[0]["v"])
    if dim % m != 0:
        raise ValueError(f"pq_fit: dim {dim} not divisible by m={m}")
    dsub = dim // m
    # fewer rows than ksub: per-subspace k shrinks identically to the
    # sequential kmeans_fit (k = number of collected init rows)
    books = [
        [list(r["v"])[s * dsub : (s + 1) * dsub] for r in init]
        for s in range(m)
    ]
    k = len(init)
    for _ in range(n_iter):
        structs = [
            F.struct(
                F.lit(s).alias("s"),
                cluster_assign(
                    F.slice(F.col("v"), s * dsub + 1, dsub), books[s]
                ).alias("cid"),
                F.slice(F.col("v"), s * dsub + 1, dsub).alias("sv"),
            )
            for s in range(m)
        ]
        rows = (
            vecs.select(F.explode(F.array(*structs)).alias("e"))
            .select(
                F.col("e.s").alias("s"),
                F.col("e.cid").alias("cid"),
                F.posexplode("e.sv").alias("pos", "val"),
            )
            .groupBy("s", "cid", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("cval")
            )
            .collect()
        )
        by_sc: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            by_sc.setdefault((r["s"], r["cid"]), {})[r["pos"]] = r["cval"]
        books = [
            [
                [by_sc[(s, c)][p] for p in range(dsub)]
                if (s, c) in by_sc
                else books[s][c]
                for c in range(k)
            ]
            for s in range(m)
        ]
    return books


def save_pq_codebooks(
    spark, books: list[list[list[float]]], path: str
) -> None:
    """Persist PQ codebooks to parquet — (sub, cid, c array<double>) rows,
    bit-exact doubles, single-slice local relation (the
    :func:`save_centroids` rationale, incl. the r16 rejection of the
    inline()-literal write). m×ksub rows — driver scale."""
    rows = [
        (s, i, [float(x) for x in c])
        for s, book in enumerate(books)
        for i, c in enumerate(book)
    ]
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "sub int, cid int, c array<double>",
    ).write.mode("overwrite").parquet(path)


def load_pq_codebooks(spark, path: str) -> list[list[list[float]]]:
    """Load a :func:`save_pq_codebooks` artifact; validates contiguous
    (sub, cid) coverage so a torn artifact fails loudly. The (sub, cid)
    sort is driver-side over m×ksub rows (the :func:`load_centroids`
    rationale)."""
    rows = spark.read.parquet(path).collect()
    rows.sort(key=lambda r: (r["sub"], r["cid"]))
    if not rows:
        raise ValueError(f"load_pq_codebooks: no rows at {path}")
    m = rows[-1]["sub"] + 1
    ksub = rows[-1]["cid"] + 1
    if [(r["sub"], r["cid"]) for r in rows] != [
        (s, i) for s in range(m) for i in range(ksub)
    ]:
        raise ValueError(
            f"load_pq_codebooks: non-contiguous (sub, cid) grid at {path} — "
            "the artifact is corrupt or was written by something else"
        )
    return [
        [list(r["c"]) for r in rows[s * ksub : (s + 1) * ksub]]
        for s in range(m)
    ]


def pq_encode(
    emb: DataFrame,
    books: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, code array<int>) PQ codes: per subspace, the argmin sub-centroid
    via the shared assignment kernel over the sliced vector — map-only,
    zero joins/shuffles, m kernel nodes. The code table is the compact
    scan-side representation (m small ints per row). ``keep`` carries
    extra columns through unchanged (the IVF-PQ path keeps the coarse
    cell id alongside each code)."""
    dsub = len(books[0][0])
    return emb.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.array(
            *[
                cluster_assign(
                    F.transform(
                        F.slice(F.col(vec_col), s * dsub + 1, dsub),
                        lambda x: x.cast("double"),
                    ),
                    book,
                )
                for s, book in enumerate(books)
            ]
        ).alias("code"),
    )


def pq_topk_adc(
    emb: DataFrame,
    query_vec: list[float],
    books: list[list[list[float]]],
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via PQ asymmetric-distance scoring with exact
    re-rank (r10): the query's per-subspace lookup table (ksub squared
    distances per subspace, computed driver-side with the shared left
    fold) turns each row's code into an approximate squared L2 distance
    — m array lookups + m-1 additions per row, no vector arithmetic in
    the scan — the best ``rerank`` rows by (adc_r, id) are then scored
    exactly by cosine and the top ``k`` returned. TakeOrderedAndProject
    both times, never a global window. Rounded ADC and cosine with id
    tie-breaks make both ranking stages engine-reproducible; the DuckDB
    oracle replays codebooks, codes, LUT and both cuts bit-for-bit.

    Output (vec_id, rank, cos_r, adc_r): ``cos_r`` is the exact score of
    the survivor, ``adc_r`` the approximation that put it in the
    candidate set — the pair is the recall diagnostic."""
    m = len(books)
    dsub = len(books[0][0])
    q = [float(x) for x in query_vec]
    luts = []
    for s, book in enumerate(books):
        qs = q[s * dsub : (s + 1) * dsub]
        lut = []
        for c in book:
            acc = 0.0
            for x, y in zip(qs, c):
                t = x - y
                acc = acc + t * t
            lut.append(acc)
        luts.append(lut)

    codes = pq_encode(emb, books, id_col, vec_col)
    adc = None
    for s in range(m):
        term = F.element_at(
            F.array(*[F.lit(v) for v in luts[s]]),
            F.element_at(F.col("code"), s + 1) + F.lit(1),
        )
        adc = term if adc is None else adc + term
    cand = (
        codes.select(F.col(id_col), F.round(adc, 6).alias("adc_r"))
        .orderBy(F.col("adc_r").asc(), F.col(id_col).asc())
        .limit(rerank)
    )
    qarr = F.array(*[F.lit(v) for v in q])
    rescored = (
        emb.join(F.broadcast(cand), id_col)
        .select(
            F.col(id_col),
            F.round(cosine(_as_double(vec_col), qarr), 6).alias("cos_r"),
            F.col("adc_r"),
        )
        .orderBy(F.col("cos_r").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.partitionBy(single_partition_key()).orderBy(
        F.col("cos_r").desc(), F.col(id_col).asc()
    )
    return rescored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select(id_col, "rank", "cos_r", "adc_r")


def _lut_sqdists(q_sub: list[float], book: list[list[float]]) -> list[float]:
    """Squared distances of one query subvector to every sub-centroid, the
    shared left-fold accumulator order (``((0.0+t0²)+t1²)+...``) so the
    doubles match `_sq_dist` / the SQL ``list_reduce`` bit-for-bit."""
    lut = []
    for c in book:
        acc = 0.0
        for x, y in zip(q_sub, c):
            t = x - y
            acc = acc + t * t
        lut.append(acc)
    return lut


def ivf_residuals(
    emb: DataFrame,
    coarse: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, residual ``vec_col``, blk) rows: each vector assigned to its
    nearest coarse centroid and re-expressed as the residual against that
    centroid — the IVF-PQ index-build projection (residuals are what the
    product codebooks quantize; FAISS ``IndexIVFPQ`` layout). Assignment
    is the shared Arrow kernel; the centroid lookup indexes a constant
    nested-array literal by blk (nlist×dim doubles folded into the plan
    once — r16; ``ARTIFACT_LOCAL_PLAN=False`` restores the original
    broadcast hash join on blk, which paid a parallelize job + broadcast
    build per materialization for the same nlist rows), and the
    subtraction a ``zip_with`` — map-side only, zero shuffles, zero
    joins. Identical doubles either way: both paths subtract the exact
    same centroid doubles elementwise."""
    spark = emb.sparkSession
    assigned = emb.select(
        F.col(id_col),
        _as_double(vec_col).alias("_v"),
        cluster_assign(_as_double(vec_col), coarse).alias("blk"),
    )
    if ARTIFACT_LOCAL_PLAN:
        from mongo_polars_reconciliation_spark.functions.localrel import (
            dbl_nested_array_col,
        )

        cent_arr = dbl_nested_array_col(coarse)
        return assigned.select(
            F.col(id_col),
            F.zip_with(
                "_v",
                F.element_at(cent_arr, F.col("blk") + F.lit(1)),
                lambda x, c: x - c,
            ).alias(vec_col),
            F.col("blk"),
        )
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(coarse)]
    cents_df = spark.createDataFrame(
        spark.sparkContext.parallelize(cent_rows, 1),
        "blk int, _cent array<double>",
    )
    return assigned.join(F.broadcast(cents_df), "blk").select(
        F.col(id_col),
        F.zip_with("_v", "_cent", lambda x, c: x - c).alias(vec_col),
        F.col("blk"),
    )


def ivfpq_topk(
    emb: DataFrame,
    query_vec: list[float],
    coarse: list[list[float]],
    books: list[list[list[float]]],
    nprobe: int = 2,
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ top-k (r10): coarse cells prune the scan, residual product
    codes score the survivors, exact cosine re-ranks — the composition of
    the two persisted artifacts (centroid table + residual codebooks) that
    is the standard billion-scale ANN index (FAISS IVFPQ; Jégou et al.
    2011). Per query: the ``nprobe`` nearest coarse cells are found
    driver-side (nlist distances — model scale, not data scale), ONLY
    those cells' rows are residual-encoded and ADC-scored under a
    per-cell lookup table (the residual query differs per cell, so each
    probed cell gets its own LUT — a literal CASE keyed on blk, m array
    lookups + m-1 adds per row; ``ARTIFACT_LOCAL_PLAN=False`` — or a LUT
    volume past ``IVFPQ_LUT_LITERAL_MAX_DOUBLES`` (r17 size gate: the
    CASE is an O(nprobe·m·ksub) expression string, so past model scale
    the broadcast form is the right plan) — restores
    the original broadcast-joined lut_df), and the best ``rerank`` rows by
    (adc_r, id) are exactly re-scored. At 100 TB the codes would be a
    precomputed table bucketed by blk, making the probe a partition-pruned
    scan of m-byte codes; this one-shot form recomputes them for the
    probed cells only — same plan shape, same answer.

    Every ranking input is rounded (adc_r, cos_r) with id tie-breaks and
    every float comes from the shared left-fold kernels, so the DuckDB
    oracle replays both cuts bit-for-bit. Output (vec_id, rank, cos_r,
    adc_r, blk): blk is the probed-cell provenance — the recall
    diagnostic for nprobe tuning."""
    spark = emb.sparkSession
    m = len(books)
    dsub = len(books[0][0])
    q = [float(x) for x in query_vec]
    dists = []
    for cid, c in enumerate(coarse):
        acc = 0.0
        for x, y in zip(q, c):
            t = x - y
            acc = acc + t * t
        dists.append((acc, cid))
    probed = [cid for _, cid in sorted(dists)[:nprobe]]
    lut_rows = []
    for cid in probed:
        qr = [x - y for x, y in zip(q, coarse[cid])]
        luts = [
            _lut_sqdists(qr[s * dsub : (s + 1) * dsub], book)
            for s, book in enumerate(books)
        ]
        lut_rows.append((cid, *luts))

    res = ivf_residuals(emb, coarse, id_col, vec_col).filter(
        F.col("blk").isin([int(p) for p in probed])
    )
    codes = pq_encode(res, books, id_col, vec_col, keep=("blk",))
    ksub = len(books[0])
    lut_literal_ok = (
        len(lut_rows) * m * ksub <= IVFPQ_LUT_LITERAL_MAX_DOUBLES
    )
    if ARTIFACT_LOCAL_PLAN and lut_literal_ok:
        # per-cell LUTs as literal CASE expressions keyed on blk (r16):
        # nprobe cells × m subspaces × ksub doubles folded into the plan
        # — the fallback's lut_df paid a parallelize job + a broadcast
        # join build for the same handful of driver-computed doubles.
        # Every row's blk is one of ``probed`` (the filter above), so the
        # CASE always matches; identical doubles by construction.
        from mongo_polars_reconciliation_spark.functions.localrel import (
            dbl_array_col,
        )

        scored = codes
        lut_expr = {}
        for s in range(m):
            e = None
            for row in lut_rows:
                arr = dbl_array_col(row[1 + s])
                cond = F.col("blk") == F.lit(int(row[0]))
                e = F.when(cond, arr) if e is None else e.when(cond, arr)
            lut_expr[s] = e
        adc = None
        for s in range(m):
            term = F.element_at(
                lut_expr[s], F.element_at(F.col("code"), s + 1) + F.lit(1)
            )
            adc = term if adc is None else adc + term
    else:
        lut_df = spark.createDataFrame(
            spark.sparkContext.parallelize(lut_rows, 1),
            "blk int, "
            + ", ".join(f"_lut{s} array<double>" for s in range(m)),
        )
        scored = codes.join(F.broadcast(lut_df), "blk")
        adc = None
        for s in range(m):
            term = F.element_at(
                F.col(f"_lut{s}"),
                F.element_at(F.col("code"), s + 1) + F.lit(1),
            )
            adc = term if adc is None else adc + term
    cand = (
        scored.select(
            F.col(id_col), F.col("blk"), F.round(adc, 6).alias("adc_r")
        )
        .orderBy(F.col("adc_r").asc(), F.col(id_col).asc())
        .limit(rerank)
    )
    qarr = F.array(*[F.lit(v) for v in q])
    rescored = (
        emb.join(F.broadcast(cand), id_col)
        .select(
            F.col(id_col),
            F.round(cosine(_as_double(vec_col), qarr), 6).alias("cos_r"),
            F.col("adc_r"),
            F.col("blk"),
        )
        .orderBy(F.col("cos_r").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.partitionBy(single_partition_key()).orderBy(
        F.col("cos_r").desc(), F.col(id_col).asc()
    )
    return rescored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select(id_col, "rank", "cos_r", "adc_r", "blk")


# A/B hook for the per-query LUT implementation inside knn_join_ivfpq.
# True = Arrow kernel (one UDF node computing residual + all m per-cell
# LUTs); False = the literal-centroid Catalyst fold path (m·ksub
# interpreted fold expressions per probe row + a broadcast join for the
# cell centroid). Identical doubles either way — the kernel replays the
# exact left-fold IEEE op sequence (see _nearest_cids_udf's contract);
# parity-pinned in tests/test_properties.py.
LUT_ARROW = True


def _pq_luts_udf(coarse: list[list[float]], books: list[list[list[float]]]):
    """Build a pandas_udf mapping (blk, vector) → the m per-subspace ADC
    lookup tables of that vector's residual against its probed cell —
    ``array<array<double>>``, outer index = subspace, inner = sub-centroid.

    Bit-parity contract (r16, the ASSIGN_ARROW treatment applied to the
    LUT projection): the residual is the elementwise double subtraction
    ``zip_with(v, cent, x - c)`` computes, and each table entry is the
    accumulator sequence ``((0.0 + t0²) + t1²) + ...`` over the subspace
    dims — vectorized across the batch and the sub-centroids, sequential
    in the dimension — the exact IEEE op order of the
    ``_fold_sum(zip_with(qs, c, (x-y)·(x-y)))`` literal fold it replaces.
    Why: the fold path is m·ksub interpreted expression-tree evaluations
    PER PROBE ROW (m·ksub·dsub ≈ 2k scalar ops each at the pinned
    geometry) plus a ~10k-node plan the driver re-analyzes per stage —
    the same ANALYSIS/codegen wall the r7 assignment kernel removed."""
    C = [[float(x) for x in c] for c in coarse]
    B = [[[float(x) for x in c] for c in book] for book in books]
    m = len(B)
    dsub = len(B[0][0])

    def fn(blks, vs):
        import numpy as np
        import pandas as pd

        if len(vs) == 0:
            return pd.Series([], dtype=object)
        a = np.stack(vs.to_numpy())
        carr = np.asarray(C, dtype=np.float64)
        r = a - carr[blks.to_numpy()]
        out_per_s = []
        for s in range(m):
            bs = np.asarray(B[s], dtype=np.float64)  # ksub × dsub
            D = np.zeros((a.shape[0], bs.shape[0]), dtype=np.float64)
            for j in range(dsub):
                t = r[:, s * dsub + j][:, None] - bs[:, j][None, :]
                D = D + t * t
            out_per_s.append(D)
        return pd.Series(
            [
                [out_per_s[s][i].tolist() for s in range(m)]
                for i in range(a.shape[0])
            ]
        )

    from pyspark.sql.types import ArrayType, DoubleType

    return F.pandas_udf(fn, ArrayType(ArrayType(DoubleType())))


def knn_join_ivfpq(
    emb: DataFrame,
    coarse: list[list[float]],
    books: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 2,
    rerank: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    res: "DataFrame | None" = None,
) -> DataFrame:
    """IVF-PQ k-NN GRAPH build (r10): every vector, as a query, probes its
    ``nprobe`` nearest coarse cells and meets those cells' members — but
    unlike :func:`knn_join_multiprobe`, the blocked pair scoring is ADC
    (m integer-code lookups into the query's per-cell LUT, no vector
    arithmetic), and the exact cosine fold runs ONLY on each query's
    ``rerank`` ADC survivors. At 100 TB the blocked self-join's pair
    count is the dominant cost of an ANN-graph build; swapping the
    64-dim fold for m array lookups on those pairs — paying the fold on
    n·rerank survivor pairs instead — is precisely the IVFPQ trade
    (Jégou et al. 2011).

    ``res`` (optional): a precomputed :func:`ivf_residuals` frame —
    typically the SAME (usually checkpointed) frame the codebooks were
    fitted on, or at 100 TB the persisted residual/code index table.
    Passing it skips re-running the assignment kernel + centroid join
    for the code side; values are identical by construction (the code
    of a row depends only on its own residual).

    Plan shape: residual-encode (map + one broadcast join) → probe
    assignment (Arrow kernel, map-only) → LUT projection (one Arrow
    kernel node computing residual + all m per-cell tables; the
    ``LUT_ARROW=False`` fallback is the original m·ksub literal folds
    per probe row + a cell-centroid broadcast join — identical doubles,
    parity-pinned) → blocked equi-join on the cell id → per-query ADC
    cut (window over the blocked pairs) → exact re-rank join on the
    survivor ids. A pair
    (q, x) arises at most once (x lives in ONE cell; q probes it or
    not), so no pair dedup is needed. Every ranking input is rounded
    with id tie-breaks; all folds share the engine accumulator order, so
    the DuckDB oracle replays both cuts bit-for-bit.

    Output (vec_id, rank, neighbor_id, cos_r, adc_r)."""
    m = len(books)
    dsub = len(books[0][0])
    spark = emb.sparkSession

    if res is None:
        res = ivf_residuals(emb, coarse, id_col, vec_col)
    codes = pq_encode(res, books, id_col, vec_col, keep=("blk",)).select(
        F.col(id_col).alias("__xid"), F.col("blk").alias("__blk"), "code"
    )

    probes = probe_assignments(emb, coarse, nprobe, id_col, vec_col)
    if LUT_ARROW:
        # one kernel node computes residual + all m LUTs (identical
        # doubles — see _pq_luts_udf); the probed cell's centroid is
        # captured in the kernel, so the cents_df broadcast join
        # disappears from the plan too
        luts = probes.select(
            F.col(id_col).alias("__qid"),
            F.col("__blk"),
            _pq_luts_udf(coarse, books)(
                F.col("__blk"), F.col("__v")
            ).alias("__luts"),
        )
        adc = None
        for s in range(m):
            term = F.element_at(
                F.element_at(F.col("__luts"), s + 1),
                F.element_at(F.col("code"), s + 1) + F.lit(1),
            )
            adc = term if adc is None else adc + term
    else:
        cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(coarse)]
        cents_df = spark.createDataFrame(
            spark.sparkContext.parallelize(cent_rows, 1),
            "__blk int, _cent array<double>",
        )
        qr = F.zip_with("__v", "_cent", lambda x, c: x - c)
        lut_cols = []
        for s, book in enumerate(books):
            qs = F.slice(qr, s * dsub + 1, dsub)
            lut_cols.append(
                F.array(
                    *[
                        _fold_sum(
                            F.zip_with(
                                qs,
                                F.array(*[F.lit(float(x)) for x in c]),
                                lambda x, y: (x - y) * (x - y),
                            )
                        )
                        for c in book
                    ]
                ).alias(f"__lut{s}")
            )
        luts = probes.join(F.broadcast(cents_df), "__blk").select(
            F.col(id_col).alias("__qid"), F.col("__blk"), *lut_cols
        )
        adc = None
        for s in range(m):
            term = F.element_at(
                F.col(f"__lut{s}"),
                F.element_at(F.col("code"), s + 1) + F.lit(1),
            )
            adc = term if adc is None else adc + term
    pairs = (
        luts.join(codes, "__blk")
        .where(F.col("__qid") != F.col("__xid"))
        .select(
            F.col("__qid"),
            F.col("__xid"),
            F.round(adc, 6).alias("adc_r"),
        )
    )
    w_adc = Window.partitionBy("__qid").orderBy(
        F.col("adc_r").asc(), F.col("__xid").asc()
    )
    cand = (
        pairs.withColumn("__arn", F.row_number().over(w_adc))
        .where(F.col("__arn") <= rerank)
        .drop("__arn")
    )

    base = _with_norm(emb.select(id_col, vec_col), vec_col, "__")
    qside = base.select(
        F.col(id_col).alias("__qid"),
        F.col("__v").alias("qv"),
        F.col("__n").alias("qn"),
    )
    xside = base.select(
        F.col(id_col).alias("__xid"),
        F.col("__v").alias("xv"),
        F.col("__n").alias("xn"),
    )
    rescored = (
        cand.join(qside, "__qid")
        .join(xside, "__xid")
        .select(
            F.col("__qid"),
            F.col("__xid"),
            F.round(
                _pair_dot(F.col("qv"), F.col("xv"))
                / (F.col("qn") * F.col("xn")),
                6,
            ).alias("cos_r"),
            F.col("adc_r"),
        )
    )
    w_cos = Window.partitionBy("__qid").orderBy(
        F.col("cos_r").desc(), F.col("__xid").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w_cos).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(id_col),
            "rank",
            F.col("__xid").alias("neighbor_id"),
            "cos_r",
            "adc_r",
        )
    )


def auto_nlist(
    emb: DataFrame, target_block_rows: int = 1024, cap: int = 65536
) -> int:
    """Scale ``nlist`` with the corpus: ``ceil(√n)``, floored so blocks
    don't shrink below ``target_block_rows`` on small corpora, capped at
    ``cap`` (FAISS-norm IVF sizing).

    Why it must scale AT ALL (VERDICT r6): a blocked self-join over nlist
    blocks of ~n/nlist rows costs ∝ nlist·(n/nlist)² = n²/nlist pairs —
    with nlist FIXED, doubling the corpus quadruples the pair count.

    Why √n and not n/target (r8, advice item): the linear form made the
    CENTROID count linear in corpus size, but centroids are the one piece
    of state this design keeps at driver/broadcast scale — kmeans_fit
    collects k×dim doubles per Lloyd round and the assignment kernel
    closes over the full centroid list. At n = 10¹⁰ vectors, n/1024 is
    ~10⁷ centroids (≈5 GB of closure at dim=64) — no longer broadcast
    scale; √n is 10⁵ (≈50 MB), and the blocked pair work becomes
    ∝ n²/√n = n^1.5 — the standard IVF trade (exhaustive in-block scan
    under a √n-sized coarse quantizer), still far from n². The cap bounds
    the closure at ~33 MB however large n gets; past that scale a real
    deployment layers a second quantizer level rather than growing the
    flat list.

    Cost of the decision itself: one ``count()`` — metadata-cheap on
    columnar sources, negligible next to the Lloyd fit that follows. The
    harness queries keep pinned integer nlist constants so the DuckDB
    oracles can replay the fit bit-for-bit; ``"auto"`` is the production
    path (nesting/cohesion property tests run it)."""
    n = emb.count()
    if n <= 0:
        return 1
    isqrt = int(n**0.5)
    if isqrt * isqrt < n:  # ceil of the integer square root
        isqrt += 1
    # keep blocks from shrinking below ~target rows on small corpora
    # (nlist ≤ ceil(n/target) ⇔ block size ≥ target): √n only takes over
    # once n > target², i.e. when the corpus is big enough to need it
    return max(1, min(cap, isqrt, -(-n // target_block_rows)))


def _resolve_nlist(
    nlist, emb: DataFrame, target_block_rows: int
) -> int:
    if nlist == "auto":
        return auto_nlist(emb, target_block_rows)
    return nlist


def topk_ivf_fitted(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nlist: "int | str" = 4,
    n_iter: int = 2,
    nprobe: int = 2,
    target_block_rows: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF with FITTED partitions: k-means the corpus (no label column
    needed), rank the fitted centroids by cosine to the query, scan only
    the vectors assigned to the best ``nprobe`` clusters. The centroid
    ranking happens driver-side (nlist×dim literals); the big scan keeps
    one projection + filter, no join."""
    nlist = _resolve_nlist(nlist, emb, target_block_rows)
    cents = kmeans_fit(emb, k=nlist, n_iter=n_iter, id_col=id_col, vec_col=vec_col)

    def cos_to_query(c: list[float]) -> float:
        # same left-fold order and correctly-rounded sqrt as the SQL
        # mirror — exact doubles, so no rounding is needed before ranking
        import math

        dot = 0.0
        nc = 0.0
        nq = 0.0
        for x, y in zip(c, query_vec):
            dot += x * float(y)
            nc += x * x
            nq += float(y) * float(y)
        if nc == 0.0 or nq == 0.0:
            # a zero-norm centroid (all-zero cluster) ranks last instead of
            # crashing the driver; the SQL mirror has the matching CASE
            return float("-inf")
        return dot / (math.sqrt(nc) * math.sqrt(nq))

    ranked = sorted(
        range(len(cents)), key=lambda i: (-cos_to_query(cents[i]), i)
    )[:nprobe]
    probe = set(ranked)
    pruned = emb.where(
        cluster_assign(_as_double(vec_col), cents).isin(*probe)
    )
    return topk_bruteforce(pruned, query_vec, k, id_col, vec_col)


def embedding_near_dups_fitted(
    emb: DataFrame,
    threshold: float = 0.9,
    nlist: "int | str" = 4,
    n_iter: int = 2,
    target_block_rows: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``embedding_near_dups`` with the block column produced by the fitted
    k-means assignment instead of an upstream label — the real-corpus form
    (no labels exist at 100 TB; near-identical vectors land in the same
    cluster, so the within-block all-pairs join stays bounded by cluster
    sizes)."""
    nlist = _resolve_nlist(nlist, emb, target_block_rows)
    cents = kmeans_fit(emb, k=nlist, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    blocked = emb.withColumn("__blk", cluster_assign(_as_double(vec_col), cents))
    return embedding_near_dups(
        blocked, threshold=threshold, id_col=id_col, vec_col=vec_col,
        block_col="__blk",
    )


def topk_ivf(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF-style approximate top-k: rank centroids by cosine to the query,
    keep the best ``nprobe`` labels, run exact scoring only inside those
    partitions. Centroid scoring happens on tiny aggregated rows (driver-side
    broadcast scale), the big scan is pruned by the label filter."""
    cents = label_centroids(emb, id_col, vec_col, label_col)
    # r17 (ADVICE r16): on a malformed query_vec SHORTER than the
    # embedding dim the two flag paths diverged silently — the broadcast
    # join dropped unmatched positions (partial dot product) while the
    # literal element_at raised under ANSI / returned NULL otherwise.
    # This row-local guard makes BOTH paths fail identically and loudly
    # before either lookup runs; for well-formed input it keeps every
    # row (assert_true returns NULL) and costs one predicate on the
    # nlist×dim centroid rows — model scale, never data scale.
    dim_guard = F.assert_true(
        F.col("pos") < F.lit(len(query_vec)),
        F.lit(
            f"topk_ivf: query_vec has {len(query_vec)} components but the "
            f"embedding centroids carry higher positions — dim mismatch"
        ),
    )
    cents = cents.where(dim_guard.isNull())
    if ARTIFACT_LOCAL_PLAN:
        # query components as one literal array indexed by pos (r16): the
        # fallback's qdf paid a default-parallelism parallelize (one
        # Python task per slice) + a broadcast join for dim driver-known
        # doubles. pos ∈ [0, dim) by construction (posexplode of
        # dim-length vectors), so the lookup always hits; same doubles.
        from mongo_polars_reconciliation_spark.functions.localrel import (
            dbl_array_col,
        )

        qarr = dbl_array_col(query_vec)
        joined = cents.withColumn(
            "qval", F.element_at(qarr, F.col("pos") + F.lit(1))
        )
    else:
        qdf = cents.sparkSession.createDataFrame(
            [(i, float(v)) for i, v in enumerate(query_vec)], ["pos", "qval"]
        )
        joined = cents.join(F.broadcast(qdf), "pos")
    cs = (
        joined.groupBy(label_col)
        .agg(
            F.sum((F.col("cval") * F.col("qval")).cast("decimal(28,12)"))
            .cast("double")
            .alias("dot"),
            F.sqrt(
                F.sum((F.col("cval") * F.col("cval")).cast("decimal(28,12)")).cast(
                    "double"
                )
            ).alias("cnorm"),
        )
        .select(
            F.col(label_col),
            F.round(F.col("dot") / F.col("cnorm"), 6).alias("c_cos"),
        )
    )
    # nlist centroid rows only, but TakeOrderedAndProject is still the right
    # plan — no single-partition window even on the small side
    probe = (
        cs.orderBy(F.col("c_cos").desc(), F.col(label_col).asc())
        .limit(nprobe)
        .select(label_col)
    )
    pruned = emb.join(F.broadcast(probe), label_col)
    return topk_bruteforce(pruned, query_vec, k, id_col, vec_col)


# Deterministic pseudo-random hyperplanes for cosine LSH: component (j, i) is
# an LCG value mapped to [-0.5, 0.5). Integer arithmetic + power-of-two
# division keep every component bit-exact in any IEEE engine, so the oracle
# SQL reproduces signatures exactly.
LSH_LCG_A = 1103515245
LSH_LCG_C = 12345
LSH_LCG_M = 65536
LSH_MIX = 4096  # j*MIX + i decorrelates planes (requires dim < 4096)


def _check_lsh_dim(dim: int) -> None:
    """The (j, i) → j·MIX + i seeding decorrelates hyperplanes only while
    i < MIX; a ≥MIX-dim embedding would silently alias plane j's tail onto
    plane j+1's head. Fail loudly instead."""
    if dim >= LSH_MIX:
        raise ValueError(
            f"LSH signature supports dim < {LSH_MIX}; got dim={dim}. "
            f"Raise LSH_MIX (changing every signature) or reduce the "
            f"embedding dimension."
        )


def _lsh_component(j: int, i: int) -> float:
    """Hyperplane component h_j[i] (0-based i), identical to the SQL form."""
    return ((LSH_LCG_A * (j * LSH_MIX + i) + LSH_LCG_C) % LSH_LCG_M) / LSH_LCG_M - 0.5


def lsh_signature_py(vec: list[float], nbits: int = 8) -> int:
    """Signature of a driver-side query vector — same fold order and IEEE ops
    as the Spark/SQL expression, so the integers agree bit-for-bit."""
    _check_lsh_dim(len(vec))
    sig = 0
    for j in range(nbits):
        s = 0.0
        for i, v in enumerate(vec):
            s += float(v) * _lsh_component(j, i)
        if s >= 0:
            sig |= 1 << j
    return sig


def lsh_signature_col(vec_col: str, nbits: int = 8, dim: int | None = None) -> Column:
    """Random-hyperplane signature as a JVM-side expression: bit j is the
    sign of the left-fold dot product with hyperplane j.

    When ``dim`` is known (it always is when a query vector exists) the
    hyperplane components are hoisted into literal arrays driver-side —
    the per-element LCG then costs nothing per row, and the only
    executor-side work is ``nbits`` zip-fold dot products (measured ~8×
    faster than the in-expression LCG form, which re-derives every
    component inside an interpreted lambda). Both forms produce
    bit-identical signatures: the components are exact binary64 either
    way (integer LCG, power-of-two divide), and the fold order is the
    same."""
    if dim is not None:
        _check_lsh_dim(dim)
        v = f"transform({vec_col}, x -> cast(x as double))"
        terms = []
        for j in range(nbits):
            plane = ", ".join(
                repr(_lsh_component(j, i)) + "D" for i in range(dim)
            )
            dot = (
                f"aggregate(zip_with({v}, array({plane}), (x, y) -> x * y), "
                f"cast(0.0 as double), (s, x) -> s + x)"
            )
            terms.append(
                f"CASE WHEN {dot} >= cast(0.0 as double) "
                f"THEN cast({1 << j} as bigint) ELSE cast(0 as bigint) END"
            )
        return F.expr(" + ".join(terms))
    # dim unknown: derive components inside the expression (slower path)
    dot_j = (
        f"aggregate(sequence(1, size(__v)), cast(0.0 as double), (s, i) -> "
        f"s + element_at(__v, i) * "
        f"(cast(pmod(cast({LSH_LCG_A} as bigint) * (j * {LSH_MIX} + i - 1) "
        f"+ {LSH_LCG_C}, {LSH_LCG_M}) as double) / {LSH_LCG_M} - 0.5))"
    )
    expr = (
        f"aggregate(sequence(0, {nbits - 1}), cast(0 as bigint), (acc, j) -> "
        f"acc + CASE WHEN {dot_j} >= cast(0.0 as double) "
        f"THEN shiftleft(cast(1 as bigint), j) ELSE cast(0 as bigint) END)"
    )
    return F.expr(
        expr.replace("__v", f"transform({vec_col}, x -> cast(x as double))")
    )


def topk_lsh(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nbits: int = 8,
    max_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate top-k: random-hyperplane signatures put
    similar vectors in the same bucket; probe the query's bucket plus its
    Hamming-``max_hamming`` neighbors, exact-rank only inside those.

    Scale path: the signature is a plain column — precompute it at ingest and
    write the table partitioned/bucketed by ``sig`` and the probe becomes
    partition pruning (read ~(1+nbits)/2^nbits of the data); computed on the
    fly it is still a pushable scan filter, never a shuffle."""
    qsig = lsh_signature_py([float(v) for v in query_vec], nbits)
    sigs = emb.withColumn(
        "sig", lsh_signature_col(vec_col, nbits, dim=len(query_vec))
    )
    probed = sigs.where(
        F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    ).drop("sig")
    return topk_bruteforce(probed, query_vec, k, id_col, vec_col)


def _with_norm(df: DataFrame, vec_col: str, prefix: str) -> DataFrame:
    """(…, {prefix}v double-array, {prefix}n norm): the norm is computed ONCE
    per vector instead of once per pair — the dot product is unavoidably
    per-pair, but hoisting both norms cuts the per-pair fold work 3× with
    bit-identical results (same IEEE ops on the same inputs, so oracle SQL
    that recomputes the norm per pair still matches exactly)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(f"{prefix}v", v).withColumn(
        f"{prefix}n",
        F.sqrt(_fold_sum(F.zip_with(F.col(f"{prefix}v"), F.col(f"{prefix}v"),
                                    lambda x, y: x * y))),
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by ``block_col``
    (IVF-style blocking: only same-cluster vectors are compared — at scale
    the blocker is an LSH/k-means assignment, here the label column).
    Norms are hoisted per-vector (see ``_with_norm``)."""
    base = _with_norm(emb.select(block_col, id_col, vec_col), vec_col, "__")
    l = base.select(
        F.col(block_col),
        F.col(id_col).alias("id_a"),
        F.col("__v").alias("va"),
        F.col("__n").alias("na"),
    )
    r = base.select(
        F.col(block_col),
        F.col(id_col).alias("id_b"),
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    dot = _pair_dot(F.col("va"), F.col("vb"))
    return (
        l.join(r, block_col)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cos_r"),
        )
        .where(F.col("cos_r") >= threshold)
    )


def semantic_contamination(
    emb: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Embedding-space benchmark decontamination: for every corpus vector,
    the maximum cosine to ANY benchmark vector and a flag at ``threshold``
    — the semantic complement of the n-gram ``contamination_probe``,
    catching paraphrased eval leakage that exact n-gram overlap misses.

    EVERY corpus row appears in the output: a row with no benchmark
    partner (e.g. the benchmark's only member is the row itself under
    ``exclude_self``) reports ``max_cos_r`` NULL and ``contaminated``
    false, instead of silently vanishing.

    ``exclude_self``: self-pair exclusion is by ID EQUALITY, which assumes
    the benchmark shares the corpus id space (the in-corpus-eval-slice
    case, as in the harness query). For an EXTERNAL benchmark whose ids
    are a different namespace, pass ``exclude_self=False`` — otherwise an
    accidental id collision would silently skip a genuine comparison.

    Scale shape: the benchmark is eval-set-sized, so it broadcasts; each
    corpus row computes |bench| fold dot-products map-side and the per-row
    max needs only a map-side-partial hash aggregate on the corpus id —
    no all-pairs shuffle ever materializes. MAX over doubles is
    order-independent, so the result is deterministic; rounding happens
    once, after the max. Norms are hoisted per-vector (``_with_norm``):
    only the dot product is per-pair work."""
    b = _with_norm(benchmark.select(id_col, vec_col), vec_col, "__b").select(
        F.col(id_col).alias("__bid"), F.col("__bv"), F.col("__bn")
    )
    base = emb.select(id_col, vec_col)
    # widen ONLY when the corpus arrives in fewer splits than the cluster
    # has cores (small-file case: |bench| dot products per row ran on 2
    # tasks of 32) — at 100 TB the scan already has more partitions and
    # this is a no-op, so no shuffle is added on the scale path
    target = emb.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < target:
        base = base.repartition(target)
    corpus = _with_norm(base, vec_col, "__a")
    cond = F.col(id_col) != F.col("__bid") if exclude_self else F.lit(True)
    # LEFT join: a corpus row with zero non-self partners still yields one
    # row (all-null bench side → null __cos → null max), so no row is lost
    pairs = corpus.join(F.broadcast(b), cond, "left")
    dot = _fold_sum(F.zip_with(F.col("__av"), F.col("__bv"), lambda x, y: x * y))
    scored = pairs.select(
        F.col(id_col), (dot / (F.col("__an") * F.col("__bn"))).alias("__cos")
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.max("__cos"), 6).alias("max_cos_r"))
        .select(
            F.col(id_col),
            "max_cos_r",
            F.coalesce(
                F.col("max_cos_r") >= threshold, F.lit(False)
            ).alias("contaminated"),
        )
    )


def knn_join(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Batch k-NN graph construction: EVERY vector's top-k neighbors by
    cosine within its block — the primitive behind SemDeDup-style semantic
    pruning, embedding-graph clustering, and retrieval-index QA, distinct
    from single-query ``topk_*`` (which score one vector against the
    corpus; this scores all-vs-all inside blocks).

    Scale shape: blocked self-join (IVF-style — at 100 TB ``block_col`` is
    a fitted k-means or LSH assignment, so join cost is bounded by block
    sizes, never n²), per-vector rank window partitioned by the vector id
    (per-key sort only). Ranking uses the 6-dp-rounded score with neighbor
    id tie-break so the graph is reproducible across engines. Norms are
    hoisted per-vector (``_with_norm``)."""
    base = _with_norm(emb.select(block_col, id_col, vec_col), vec_col, "__")
    l = base.select(
        F.col(block_col),
        F.col(id_col).alias("__ida"),
        F.col("__v").alias("va"),
        F.col("__n").alias("na"),
    )
    r = base.select(
        F.col(block_col),
        F.col(id_col).alias("neighbor_id"),
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    dot = _pair_dot(F.col("va"), F.col("vb"))
    scored = (
        l.join(r, block_col)
        .where(F.col("__ida") != F.col("neighbor_id"))
        .select(
            F.col("__ida"),
            "neighbor_id",
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cos_r"),
        )
    )
    w = Window.partitionBy("__ida").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col("__ida").alias(id_col), "rank", "neighbor_id", "cos_r")
    )


def probe_assignments(
    emb: DataFrame,
    cents: list[list[float]],
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, __v, __n, __blk) rows: each vector assigned to its ``nprobe``
    NEAREST fitted centroids — the multi-probe generalization of
    :func:`cluster_assign` (which is exactly ``nprobe=1``). Ranking is
    (squared distance, cid) ascending via ``array_sort`` over literal-
    centroid structs, the same argmin-with-cid-tie-break contract, so the
    first probe of every vector equals its single-block assignment.

    Why: single-block ANN (``knn_join``/``semantic_dedup``) is blind to
    nearest-neighbor pairs straddling a cluster boundary; a vector sitting
    near the edge meets its across-the-border neighbors in its SECOND
    closest cluster. Cost: each vector appears in ``nprobe`` blocks, so
    downstream blocked self-joins grow ≤ nprobe²× (still bounded by block
    sizes, never n²). Zero joins, zero shuffles here — the assignment is a
    pure projection (Arrow kernel by default, literal-centroid
    ``array_sort`` structs as the ``ASSIGN_ARROW=False`` fallback; same
    doubles, same (d, cid) ordering), map-only at 100 TB."""
    base = _with_norm(emb.select(id_col, vec_col), vec_col, "__")
    if ASSIGN_ARROW:
        probes = _nearest_cids_udf(cents, nprobe)(F.col("__v"))
        return base.select(
            F.col(id_col),
            F.col("__v"),
            F.col("__n"),
            F.explode(probes).alias("__blk"),
        )
    structs = [
        F.struct(
            _sq_dist(F.col("__v"), c).alias("d"),
            F.lit(i).cast("int").alias("cid"),
        )
        for i, c in enumerate(cents)
    ]
    probes = F.slice(F.array_sort(F.array(*structs)), 1, nprobe)
    return base.select(
        F.col(id_col),
        F.col("__v"),
        F.col("__n"),
        F.explode(F.transform(probes, lambda s: s["cid"])).alias("__blk"),
    )


def knn_join_multiprobe(
    emb: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    nlist: "int | str" = 4,
    n_iter: int = 2,
    target_block_rows: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: "list[list[float]] | None" = None,
) -> DataFrame:
    """:func:`knn_join` over FITTED multi-probe blocks: every vector's
    top-k cosine neighbors among vectors sharing ANY of its ``nprobe``
    nearest k-means clusters. Strictly more complete than single-block
    (probe sets are nested in ``nprobe``, so the candidate pair set only
    grows — property-pinned in tests), catching boundary-straddling
    neighbors single-block blocking misses.

    ``cents`` (r10): pass a pre-fitted centroid list (typically
    :func:`load_centroids` of a persisted artifact) to skip the in-
    session Lloyd fit — the fit-once/assign-many production shape;
    nlist/n_iter are ignored when given.

    Scale shape: k-means fit (k×dim driver rows only) → map-only probe
    assignment → blocked self-join bounded by (nprobe × block size) → pair
    dedup on the scored rows (a pair sharing both probed clusters scores
    identically, so DISTINCT removes the duplicate) → per-vector rank
    window. The per-pair fold dot product is the dominant cost, and
    cosine is symmetric, so each UNORDERED pair is scored once
    (``id_a < id_b``) and the two directed graph rows come from an
    explode of the narrow scored row — halving the fold work relative to
    scoring both directions (measured ~25% faster end-to-end at sf0.1)
    with bit-identical values."""
    if cents is None:
        nlist = _resolve_nlist(nlist, emb, target_block_rows)
        cents = kmeans_fit(
            emb, k=nlist, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        )
    blocked = probe_assignments(
        emb, cents, nprobe, id_col, vec_col
    ).localCheckpoint(eager=False)
    l = blocked.select(
        F.col("__blk"),
        F.col(id_col).alias("__ida"),
        F.col("__v").alias("va"),
        F.col("__n").alias("na"),
    )
    r = blocked.select(
        F.col("__blk"),
        F.col(id_col).alias("__idb"),
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    dot = _pair_dot(F.col("va"), F.col("vb"))
    half = (
        l.join(r, "__blk")
        .where(F.col("__ida") < F.col("__idb"))
        .select(
            F.col("__ida"),
            F.col("__idb"),
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cos_r"),
        )
        .distinct()
    )
    scored = half.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("__ida").alias("src"), F.col("__idb").alias("nb")
                ),
                F.struct(
                    F.col("__idb").alias("src"), F.col("__ida").alias("nb")
                ),
            )
        ).alias("p"),
        "cos_r",
    ).select(
        F.col("p.src").alias("__ida"),
        F.col("p.nb").alias("neighbor_id"),
        "cos_r",
    )
    w = Window.partitionBy("__ida").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col("__ida").alias(id_col), "rank", "neighbor_id", "cos_r")
    )


def semantic_dedup_fitted(
    emb: DataFrame,
    threshold: float = 0.9,
    nprobe: int = 2,
    nlist: "int | str" = 4,
    n_iter: int = 2,
    target_block_rows: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: "list[list[float]] | None" = None,
) -> DataFrame:
    """:func:`semantic_dedup` over FITTED multi-probe blocks: a vector is
    dropped iff some lower-id vector shares ANY of its ``nprobe`` nearest
    clusters with cosine ≥ ``threshold``. The real-corpus form (no label
    column exists at 100 TB) with the boundary-blindness of single-block
    blocking reduced: near-duplicates split across a cluster edge still
    meet through their second probe. Returns surviving ids. ``cents``
    (r10): a pre-fitted centroid list skips the in-session fit — see
    :func:`knn_join_multiprobe`."""
    if cents is None:
        nlist = _resolve_nlist(nlist, emb, target_block_rows)
        cents = kmeans_fit(
            emb, k=nlist, n_iter=n_iter, id_col=id_col, vec_col=vec_col
        )
    blocked = probe_assignments(
        emb, cents, nprobe, id_col, vec_col
    ).localCheckpoint(eager=False)
    l = blocked.select(
        F.col("__blk"),
        F.col(id_col).alias("__ida"),
        F.col("__v").alias("va"),
        F.col("__n").alias("na"),
    )
    r = blocked.select(
        F.col("__blk"),
        F.col(id_col).alias("__idb"),
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    dot = _pair_dot(F.col("va"), F.col("vb"))
    dropped = (
        l.join(r, "__blk")
        .where(F.col("__idb") < F.col("__ida"))
        .select(
            F.col("__ida").alias(id_col),
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("__cos"),
        )
        .where(F.col("__cos") >= threshold)
        .select(id_col)
        .distinct()
    )
    return emb.select(id_col).join(dropped, id_col, "left_anti")


def assignment_state(
    emb: DataFrame,
    cents: list[list[float]],
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(blk, vec_id) probe-assignment rows of a corpus under PERSISTED
    centroids — the vector-side analog of the text pipeline's
    ``band_state`` (r10): the accumulated assignment table the
    incremental semantic ingest probes, BUCKETED by blk in production
    (``write_bucketed_state(..., key='blk')``; plan-pinned in
    tests/test_bucketing.py) so the (huge) state side of the collision
    join never reshuffles. Map-only projection — the assignment kernel
    closes over the loaded centroid artifact, no joins."""
    return probe_assignments(emb, cents, nprobe, id_col, vec_col).select(
        F.col("__blk").alias("blk"), F.col(id_col)
    )


def ingest_novel_semantic(
    new_vecs: DataFrame,
    state_assign: DataFrame,
    state_vecs: DataFrame,
    cents: list[list[float]],
    threshold: float = 0.9,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mis_max_iter: int = 25,
) -> DataFrame:
    """Incremental SEMANTIC ingest (r10) — the near-dup ingest family
    (extensions/dedup.py:ingest_novel_neardup) extended to embedding
    space: of an arriving batch of vectors, admit those that are not
    semantic duplicates (cosine ≥ ``threshold``, the SemDeDup rule) of
    (a) the persisted corpus or (b) an already-admitted batch member.
    Returns the admitted (vec_id) rows; the caller appends their
    :func:`assignment_state` rows to ``state_assign`` and the vectors
    themselves to ``state_vecs``. Exact re-uploads are cos 1.0, so no
    separate digest phase is needed.

    State contract: ``cents`` is the PERSISTED centroid artifact
    (:func:`load_centroids` — fitted once, never refit per batch, or
    probe keys would drift between waves exactly like mismatched MinHash
    geometry); ``state_assign`` = accumulated (blk, vec_id) table under
    those centroids, bucketed by blk in production; ``state_vecs`` = the
    vector store, read ONLY for the docs whose probe blocks collide with
    the batch, via a semi-join — history is never rescanned, and
    duplicate state rows (a crash-replayed streaming append) are deduped
    after that semi-join, bounded by collision count. Ids must be unique
    across state and batch, arrival order = id order.

    Pipeline: (1) batch probe assignments (map-only kernel projection);
    (2) block collisions vs the assignment STATE → candidate (batch,
    history) pairs, cosine-verified against only the colliding history
    vectors; (3) survivors' within-batch block pairs verified the same
    way feed the shared sequential-arrival admission tail
    (``ingest_kernel.admit_sequential`` → ``greedy_admit`` — see there
    for why per-pair/per-cluster keep-lowest break redelivery
    idempotence and batch-split equivalence; both properties pinned in
    tests/test_properties.py for this operator too). This family has no
    digest phase (an exact re-upload is cosine 1.0) and no hot-bucket
    cap (block population is bounded by the fitted nlist geometry), so
    only the tail is kernel code.

    Scale shape: phase 2's collision join hits a state table bucketed by
    blk (plan pin in tests/test_bucketing.py), so the accumulated
    assignment state never reshuffles and verification touches
    |candidates| history vectors, not |history|; phase 3 is bounded by
    nprobe × block size like every fitted-block self-join. The Arrow
    pair-dot kernel scores each pair once; all cosines are 6-dp rounded
    before thresholding, so the DuckDB oracle replays every decision."""
    from mongo_polars_reconciliation_spark.extensions.ingest_kernel import (
        admit_sequential,
    )

    ba = probe_assignments(
        new_vecs, cents, nprobe, id_col, vec_col
    ).localCheckpoint(eager=False)

    # phase 2: history collisions → cosine-verify against the few
    # colliding history vectors only
    cand_hist = (
        ba.select(F.col("__blk").alias("blk"), F.col(id_col).alias("__bid"))
        .join(
            state_assign.select("blk", F.col(id_col).alias("__hid")), "blk"
        )
        .select("__bid", "__hid")
        .distinct()
        .localCheckpoint(eager=False)
    )
    hist_vecs = _with_norm(
        state_vecs.select(id_col, vec_col)
        .join(cand_hist.select(F.col("__hid").alias(id_col)).distinct(), id_col)
        .distinct(),
        vec_col,
        "__h",
    ).select(
        F.col(id_col).alias("__hid"),
        F.col("__hv"),
        F.col("__hn"),
    )
    # one row per batch vector: recomputed map-only from the batch (same
    # projection probe_assignments starts from, so identical doubles) —
    # cheaper than DISTINCTing the nprobe-exploded assignment rows, which
    # would shuffle the vector arrays themselves
    bv = _with_norm(new_vecs.select(id_col, vec_col), vec_col, "__").select(
        F.col(id_col).alias("__bid"), "__v", "__n"
    )
    dropped_hist = (
        cand_hist.join(bv, "__bid")
        .join(hist_vecs, "__hid")
        .select(
            F.col("__bid"),
            F.round(
                _pair_dot(F.col("__v"), F.col("__hv"))
                / (F.col("__n") * F.col("__hn")),
                6,
            ).alias("__cos"),
        )
        .where(F.col("__cos") >= threshold)
        .select(F.col("__bid").alias(id_col))
        .distinct()
    )
    kept = (
        new_vecs.select(id_col)
        .join(dropped_hist, id_col, "left_anti")
        .localCheckpoint(eager=False)
    )

    # phase 3: within-batch block pairs among the history-clean vectors
    # only (a history-dropped vector is never admitted, so it cannot
    # block anyone — sequential semantics), then greedy admission
    ba2 = ba.join(kept, id_col)
    l = ba2.select(
        F.col("__blk"),
        F.col(id_col).alias("__ida"),
        F.col("__v").alias("va"),
        F.col("__n").alias("na"),
    )
    r = ba2.select(
        F.col("__blk"),
        F.col(id_col).alias("__idb"),
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    edges = (
        l.join(r, "__blk")
        .where(F.col("__ida") < F.col("__idb"))
        .select("__ida", "__idb", "va", "vb", "na", "nb")
        .distinct()
        .select(
            "__ida",
            "__idb",
            F.round(
                _pair_dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("__cos"),
        )
        .where(F.col("__cos") >= threshold)
        .select(F.col("__ida").alias("lo"), F.col("__idb").alias("hi"))
    )
    return admit_sequential(kept, edges, id_col, mis_max_iter)


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """SemDeDup-style semantic pruning: a vector is DROPPED iff some
    lower-id vector in its block has cosine ≥ ``threshold`` — deterministic
    keep-lowest, the same greedy rule the text-side near-dup drop uses, so
    exact semantic duplicates keep exactly one representative per block.
    Returns the survivors.

    Composition of :func:`knn_join`'s blocked-pair machinery with an
    existence test instead of a rank: one blocked self-join + one
    left_anti — no windows needed, cost bounded by block sizes."""
    base = _with_norm(emb.select(block_col, id_col, vec_col), vec_col, "__")
    l = base.select(
        F.col(block_col),
        F.col(id_col).alias("__ida"),
        F.col("__v").alias("va"),
        F.col("__n").alias("na"),
    )
    r = base.select(
        F.col(block_col),
        F.col(id_col).alias("__idb"),
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    dot = _pair_dot(F.col("va"), F.col("vb"))
    dropped = (
        l.join(r, block_col)
        # only pairs where a LOWER id dominates this vector
        .where(F.col("__idb") < F.col("__ida"))
        .select(
            F.col("__ida").alias(id_col),
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("__cos"),
        )
        .where(F.col("__cos") >= threshold)
        .select(id_col)
        .distinct()
    )
    return emb.select(id_col, block_col).join(dropped, id_col, "left_anti")


def knn_join_exact(
    emb: DataFrame,
    k: int = 10,
    n_buckets: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT k-NN graph: every vector's true top-k cosine neighbors over
    ALL other vectors — the ground truth an ANN index is measured against.
    O(n²) pair work by definition; what a Spark implementation controls is
    the SHAPE of that work: the all-pairs join is realized as a block-pair
    equi-join (1-bucket-theta style: each row is replicated to ``n_buckets``
    composite keys, every unordered bucket pair meets at exactly one key),
    so the plan has NO CartesianProduct/BNLJ node, the n² pairs spread
    evenly over n_buckets² tasks, and each unordered vector pair is scored
    ONCE (``id_a < id_b``) then exploded into both directed rows — the
    same symmetric-scoring trick as :func:`knn_join_multiprobe`, with the
    same 6-dp rounding and (cos DESC, neighbor ASC) tie-break so the two
    graphs are set-comparable bit-for-bit.

    At 100 TB this is not a production path — it is the recall harness
    (``ann_recall_at_k``) run on a sampled slice to measure index quality;
    the docstring of auto_nlist covers what production runs instead."""
    base = _with_norm(emb.select(id_col, vec_col), vec_col, "__").select(
        F.col(id_col),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
        .cast("int")
        .alias("__bk"),
        "__v",
        "__n",
    )
    all_b = F.array(*[F.lit(i).cast("int") for i in range(n_buckets)])
    l = base.select(
        F.col("__bk").alias("__ba"),
        F.explode(all_b).alias("__bb"),
        F.col(id_col).alias("__ida"),
        F.col("__v").alias("va"),
        F.col("__n").alias("na"),
    )
    r = base.select(
        F.explode(all_b).alias("__ba"),
        F.col("__bk").alias("__bb"),
        F.col(id_col).alias("__idb"),
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    # Explicit-count repartition on the join keys: the replicated sides are
    # only n·n_buckets slim rows, so AQE's size-based coalescing would fold
    # the join to ONE post-shuffle partition and run all n² pair dots on a
    # single core (measured r8: 11–17 s for 250k pairs at sf0.1, vs 2.4 s
    # spread). A numbered repartition is user-specified — AQE keeps it —
    # and it matches the join keys, so the join reuses the exchange.
    target = emb.sparkSession.sparkContext.defaultParallelism
    l = l.repartition(target, "__ba", "__bb")
    r = r.repartition(target, "__ba", "__bb")
    dot = _pair_dot(F.col("va"), F.col("vb"))
    half = (
        l.join(r, ["__ba", "__bb"])
        .where(F.col("__ida") < F.col("__idb"))
        .select(
            "__ida",
            "__idb",
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cos_r"),
        )
    )
    scored = half.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("__ida").alias("src"), F.col("__idb").alias("nb")
                ),
                F.struct(
                    F.col("__idb").alias("src"), F.col("__ida").alias("nb")
                ),
            )
        ).alias("p"),
        "cos_r",
    ).select(
        F.col("p.src").alias("__ida"),
        F.col("p.nb").alias("neighbor_id"),
        "cos_r",
    )
    w = Window.partitionBy("__ida").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col("__ida").alias(id_col), "rank", "neighbor_id", "cos_r")
    )


def knn_join_exact_probes(
    emb: DataFrame,
    probes: DataFrame,
    k: int = 10,
    n_buckets: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ONE-SIDED exact k-NN: the true top-k cosine neighbors over the full
    corpus, computed only FOR the probe ids — O(|probes|·n) pair work
    instead of :func:`knn_join_exact`'s O(n²), which is what makes exact
    ground truth affordable at corpus scale when the probe set is a
    sample. Same block-pair equi-join shape (probe side replicated to
    every corpus bucket, corpus side in its own bucket, so the plan has
    no cartesian node and the |probes|·n pairs spread over
    n_buckets² tasks), same 6-dp cosine and (cos DESC, neighbor ASC)
    tie-break — a probe's rows here are BIT-IDENTICAL to its rows in the
    full graph (property-pinned), because the directed pair dot runs the
    same IEEE fold on the same operands.

    No symmetric-halving here: pairs are directed probe→corpus by
    construction (the halving trick only pays when both directions are
    wanted). Self-pairs are excluded like the full graph's."""
    base = _with_norm(emb.select(id_col, vec_col), vec_col, "__").select(
        F.col(id_col),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
        .cast("int")
        .alias("__bk"),
        "__v",
        "__n",
    )
    all_b = F.array(*[F.lit(i).cast("int") for i in range(n_buckets)])
    l = (
        base.join(probes.select(id_col).distinct(), id_col)
        .select(
            F.col("__bk").alias("__ba"),
            F.explode(all_b).alias("__bb"),
            F.col(id_col).alias("__ida"),
            F.col("__v").alias("va"),
            F.col("__n").alias("na"),
        )
    )
    # the corpus side keys on its own bucket (replicated across the probe
    # side's buckets) so each (probe, corpus row) pair meets at exactly
    # one (__ba, __bb) cell. Numbered repartition on the join keys — the
    # AQE-coalescing exemption knn_join_exact needs (the replicated sides
    # are slim, AQE would fold the pair scoring onto one core; measured r8).
    r = base.select(
        F.explode(all_b).alias("__ba"),
        F.col("__bk").alias("__bb"),
        F.col(id_col).alias("__idb"),
        F.col("__v").alias("vb"),
        F.col("__n").alias("nb"),
    )
    target = emb.sparkSession.sparkContext.defaultParallelism
    l = l.repartition(target, "__ba", "__bb")
    r = r.repartition(target, "__ba", "__bb")
    dot = _pair_dot(F.col("va"), F.col("vb"))
    scored = (
        l.join(r, ["__ba", "__bb"])
        .where(F.col("__ida") != F.col("__idb"))
        .select(
            "__ida",
            F.col("__idb").alias("neighbor_id"),
            F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cos_r"),
        )
    )
    w = Window.partitionBy("__ida").orderBy(
        F.col("cos_r").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col("__ida").alias(id_col), "rank", "neighbor_id", "cos_r")
    )


def ann_recall_at_k_sampled(
    emb: DataFrame,
    strata_col: str = "label",
    k_sample: int = 5,
    k: int = 10,
    nprobe: int = 2,
    nlist: "int | str" = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The recall probe AT CORPUS SCALE (r9): :func:`ann_recall_at_k`'s
    exact-truth side is O(n²) — fine as a harness, unrunnable on a
    billion vectors. This composition makes the docstring's "run on a
    representative sample" real: ``sample_fixed_per_stratum`` carves a
    deterministic k-per-stratum probe set (KMV-mergeable, so the probe
    set is stable as the corpus grows), the exact graph is built only
    FOR the probes against the full corpus
    (:func:`knn_join_exact_probes`, O(sample·n)), and the ANN side is
    the unchanged production multiprobe graph restricted to probe rows.
    Per-probe rows (id, stratum, n_true, n_hit, recall_r) bit-match the
    full probe's rows for the same ids (property-pinned) and aggregate
    per stratum as AVG(recall_r) — the per-language/per-source index
    quality readout."""
    from mongo_polars_reconciliation_spark.extensions.text import (
        floor4,
        sample_fixed_per_stratum,
    )

    probes = sample_fixed_per_stratum(
        emb, strata_col, k_sample, id_col=id_col
    ).select(strata_col, id_col)
    truth = knn_join_exact_probes(
        emb, probes, k=k, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col), "neighbor_id")
    ann = (
        knn_join_multiprobe(
            emb,
            k=k,
            nprobe=nprobe,
            nlist=nlist,
            n_iter=n_iter,
            id_col=id_col,
            vec_col=vec_col,
        )
        .join(probes.select(id_col), id_col)
        .select(F.col(id_col), "neighbor_id", F.lit(1).alias("__hit"))
    )
    return (
        truth.join(ann, [id_col, "neighbor_id"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("__hit").alias("n_hit"),
        )
        .join(probes, id_col)
        .select(
            F.col(id_col),
            F.col(strata_col),
            "n_true",
            "n_hit",
            floor4(F.col("n_hit") / F.col("n_true")).alias("recall_r"),
        )
    )


def ann_recall_at_k(
    emb: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    nlist: "int | str" = 4,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the fitted multi-probe ANN graph against the exact
    brute-force truth — the quality gate that turns "the ANN path is fast"
    into "the ANN path is measurably good" (the first question a user
    sizing nprobe/nlist asks). Per vector: n_true exact neighbors (= k),
    n_hit of them found by :func:`knn_join_multiprobe`, and the floor4
    recall ratio. Aggregate recall is AVG(recall_r); emitting per-vector
    rows keeps the distribution visible (boundary-straddling vectors are
    exactly the ones that drop below 1.0) and lets the oracle replay every
    row bit-for-bit. Both graphs use the same 6-dp-rounded cosine and
    (cos DESC, neighbor ASC) tie-break, so membership comparison is exact.

    Scale: truth is O(n²) — run on a representative sample at corpus
    scale; the ANN side is the production path being measured."""
    from mongo_polars_reconciliation_spark.extensions.text import floor4

    truth = knn_join_exact(emb, k=k, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col), "neighbor_id"
    )
    ann = knn_join_multiprobe(
        emb,
        k=k,
        nprobe=nprobe,
        nlist=nlist,
        n_iter=n_iter,
        id_col=id_col,
        vec_col=vec_col,
    ).select(F.col(id_col), "neighbor_id", F.lit(1).alias("__hit"))
    return (
        truth.join(ann, [id_col, "neighbor_id"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("__hit").alias("n_hit"),
        )
        .select(
            F.col(id_col),
            "n_true",
            "n_hit",
            floor4(F.col("n_hit") / F.col("n_true")).alias("recall_r"),
        )
    )
