"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB dedup pipeline shape:
- *exact*: one hash-groupBy shuffle on a digest column;
- *MinHash+LSH*: shingle → minhash signature → band buckets → bucket join →
  exact-Jaccard verification of candidates only (never all pairs);
- *SimHash*: per-token bit votes → 64-bit signature → 4×16-bit block
  pigeonhole join → Hamming filter;
- *n-gram Jaccard*: shingle inverted index with a document-frequency cap
  (stop-shingle removal bounds the index blowup), then pair-count verify.

``hash_mode``: "poly" (default) assigns shingle ids with a polynomial
rolling string hash — narrow column arithmetic, no dictionary, no global
sort, no join, and bit-identical in ANSI SQL, so the oracle mirrors it.
"xxhash64" is the single-call JVM hash for pipelines that never need
cross-engine reproduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo_polars_reconciliation_spark.extensions.ingest_kernel import (
    admit_sequential,
    combined_cap_keys,
    digest_novel_keepers,
    greedy_admit as _greedy_admit,  # shared kernel; re-exported — the
    # similarity/multimodal ingest faces and the property tests import
    # it from here (moved verbatim in r13, value-identical)
)

# Universal-hash constants: h_j(x) = (A_j * x + B_j) mod P. Deterministic
# literals so the oracle SQL can reproduce them.
MINHASH_P = 8191
# SimHash: 31-bit token ids (Mersenne prime 2^31-1) feed 64 double-round
# multiplicative parity hashes. ONE affine round is not enough: if the
# product doesn't wrap the modulus, parity is linear in k and the
# signature degenerates to 0101... — the second multiply wraps ~2^29
# times, scrambling parity. Every intermediate product stays < 2^63 so
# BIGINT arithmetic is exact (and overflow-free) in Spark AND DuckDB.
SIMHASH_SID_P = 2147483647
SIMHASH_A1 = 1103515245
SIMHASH_A2 = 2654435761
SIMHASH_BITS = 64
SIMHASH_BLOCKS = 4
SIMHASH_BLOCK_BITS = 16


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text with the keeper
    (min id) and the copy count. Keeper choice is deterministic (min id), not
    order-dependent like Polars ``unique(keep='first')``."""
    return (
        df.select(
            F.md5(F.col(text_col).cast("binary")).alias("text_hash"), F.col(id_col)
        )
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def ingest_novel(
    new_docs: DataFrame,
    state_digests: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental corpus ingest — the crawl loop's dedup step: of an
    arriving batch, keep ONE copy per content digest (min id, the
    deterministic keeper rule of :func:`exact_dedup_groups`) whose digest
    is ABSENT from the persisted state, i.e. never seen in any prior
    ingest. Returns (id, text_hash) of the novel keepers; the caller
    appends them to the state (``sources/state.py:upsert_state_table``
    for transactional stores, or a partitioned-parquet union) and admits
    only these documents downstream — the first question of every "new
    dump arrived" decision, answered without rescanning history.

    ``state_digests`` is any frame with a ``text_hash`` column (the
    accumulated digest set). NULL text digests as '' (the r8 null-text
    rule shared with leakage_safe_split).

    Scale shape: one digest hash-aggregate over the batch (map-side
    combine; the batch, not history, is scanned) + one LEFT ANTI join on
    the digest against the state. Both sides shuffle on the digest; a
    production state table is BUCKETED by text_hash so the anti-join is
    shuffle-free on the (huge) state side and only the new batch moves.
    Nothing driver-side; output ≤ distinct-batch-digests rows. Body =
    the shared kernel's phase-1 verbatim (ingest_kernel.py, r13) plus
    this family's digest rule."""
    dg = F.md5(
        F.coalesce(F.col(text_col), F.lit("")).cast("binary")
    ).alias("__dg")
    return digest_novel_keepers(
        new_docs.select(F.col(id_col), dg), state_digests, id_col, "text_hash"
    ).select(F.col(id_col), F.col("__dg").alias("text_hash"))


def band_state(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    hash_mode: str = "poly",
) -> DataFrame:
    """(bband, doc_id) MinHash band-key table of a corpus — the persisted
    NEAR-dup state the crawl loop keeps next to the exact digest set.
    ``bband`` is the single composite key ``band || ':' || bkey``: one
    column instead of (band, bkey) so the state table can be BUCKETED by
    exactly the join key and the incremental band anti-join reads the
    (huge) state side with no exchange (``write_bucketed_state(...,
    key='bband')``; plan-pinned in tests/test_bucketing.py) — the same
    treatment the digest state gets for :func:`ingest_novel`.

    NULL text digests as '' (shared null-text rule); docs shorter than
    ``n`` tokens carry no shingles, hence no band keys — they are
    exact-dedup-only, by construction."""
    base = docs.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )
    sigs = minhash_signatures_wide(
        _shingle_ids(shingles(base, id_col, text_col, n), hash_mode),
        id_col,
        num_hashes,
    )
    bk = _band_keys_wide(sigs, id_col, num_hashes // bands, num_hashes)
    return bk.select(
        F.concat_ws(":", F.col("band").cast("string"), F.col("bkey")).alias(
            "bband"
        ),
        F.col(id_col),
    )


def ingest_novel_neardup(
    new_docs: DataFrame,
    state_digests: DataFrame,
    state_bands: DataFrame,
    state_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.6,
    hash_mode: str = "poly",
    max_bucket_size: int | None = None,
    mis_max_iter: int = 25,
) -> DataFrame:
    """Incremental NEAR-dup ingest — the full "new dump arrived" decision
    (r9; extends :func:`ingest_novel`, which answers only the exact-digest
    half): of an arriving batch, admit the documents that are neither
    exact copies NOR verified near-duplicates of (a) the persisted corpus
    or (b) an already-admitted batch member. Returns (id, text_hash) of
    the admitted docs; the caller appends their digests to
    ``state_digests``, their :func:`band_state` rows to ``state_bands``,
    and the docs themselves to the corpus store.

    State contract: ``state_digests`` = accumulated (text_hash) set;
    ``state_bands`` = accumulated (bband, doc_id) band-key table
    (:func:`band_state`, bucketed by bband in production);
    ``state_docs`` = the corpus store (id, text) — read ONLY for the
    (few) docs whose band keys collide with the batch, via a semi-join;
    history is never rescanned. Ids must be unique across state and
    batch (ingest assigns monotone ids — arrival order IS id order).

    Pipeline: (1) within-batch exact collapse (min-id keeper per digest)
    + digest anti-join, exactly :func:`ingest_novel`; (2) MinHash band
    keys of the survivors joined against the band STATE → candidate
    (batch, history) pairs, exact-Jaccard-verified at ``threshold`` over
    shingles — history shingles computed only for collision candidates;
    (3) the remaining batch docs' candidate pairs among THEMSELVES,
    verified the same way, feed the shared admission tail
    (``ingest_kernel.admit_sequential`` → ``greedy_admit``; see there
    for why per-pair/per-cluster keep-lowest break idempotence). Docs
    with no shingles (< n tokens) are exact-dedup-only by construction.
    Phases 1 (digest keepers) and the hot-bucket cap are the kernel's
    too (r13 extraction); this body keeps only the text-family pieces —
    MinHash band keys, the ghost-row/survivor-exclusion rules below,
    and exact-Jaccard verification.

    ``max_bucket_size`` (r10: extended from within-batch-only to BOTH
    collision joins, the ``ingest_novel_payloads`` treatment): a
    boilerplate band key shared corpus-wide — the canonical LSH hot
    bucket — would fan every batch doc carrying it out to all its
    history holders. With the cap set, the per-key population is counted
    over the batch's keys plus the state rows those keys TOUCH (the
    bucketed key semi-join reads only matching buckets, never full
    history) and over-cap keys are dropped from the history join; the
    within-batch phase keeps its batch-side count via
    :func:`_pairs_from_band_keys`. A bucket that common is boilerplate
    collision — genuinely similar docs still meet in their other bands —
    and a dropped bucket's candidates would have failed the Jaccard
    verify anyway in that case (pinned capped ≡ uncapped on a
    boilerplate-header corpus in tests/test_lsh_cap.py). Default None =
    exact, all driver queries' current behavior.

    Scale shape: phase 1 is the digest-bucketed anti-join (plan pin in
    tests/test_bucketing.py); phase 2's band join hits a state table
    bucketed by the composite bband key, so the accumulated band state
    never reshuffles (second plan pin there) and verification touches
    |candidates| history docs, not |history|; phase 3 runs on the batch
    only. The only iterative part (greedy admission) is bounded by the
    batch's pair-chain depth with a loud ``mis_max_iter`` guard."""
    b = new_docs.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    )
    dg = F.md5(F.col(text_col).cast("binary")).alias("__dg")
    keep1 = digest_novel_keepers(
        b.select(F.col(id_col), dg), state_digests, id_col, "text_hash"
    ).localCheckpoint(eager=False)
    kept = b.join(keep1.select(id_col), id_col).localCheckpoint(eager=False)

    # batch band keys (wide signatures — the minhash_near_dups shape);
    # r16: array-form checkpoint so per-doc sizes are row-local (see
    # shingle_sets / minhash_near_dups — one full-frame aggregation
    # removed per verify, bit-identical)
    sets_b_base = shingle_sets(kept, id_col, text_col, n)
    target = new_docs.sparkSession.sparkContext.defaultParallelism
    if sets_b_base.rdd.getNumPartitions() < target:
        sets_b_base = sets_b_base.repartition(target, F.col(id_col))
    sets_b = sets_b_base.localCheckpoint(eager=False)
    sh_b = sets_b.select(F.col(id_col), F.explode("__shset").alias("shingle"))
    sizes_b = sets_b.select(F.col(id_col), F.size("__shset").alias("sz"))
    bk = _band_keys_wide(
        minhash_signatures_wide(_shingle_ids(sh_b, hash_mode), id_col, num_hashes),
        id_col,
        num_hashes // bands,
        num_hashes,
    ).select(
        F.concat_ws(":", F.col("band").cast("string"), F.col("bkey")).alias(
            "bband"
        ),
        F.col(id_col),
        F.col("band"),
        F.col("bkey"),
    ).localCheckpoint(eager=False)

    # phase 2: history collisions → exact-Jaccard verify against the few
    # colliding history docs only
    bk_h = bk.select("bband", F.col(id_col).alias("__bid"))
    hits = state_bands.select("bband", F.col(id_col).alias("__hid"))
    if max_bucket_size is not None:
        # combined batch + touched-state population per key; the state
        # count reads only the buckets the batch's keys hit (bucketed
        # semi-join — exchange-free on the stored side, never a full
        # state re-aggregation)
        hits = hits.join(
            bk_h.select("bband").distinct(), "bband"
        ).localCheckpoint(eager=False)
        ok = combined_cap_keys(bk_h, hits, "bband", max_bucket_size)
        bk_h = bk_h.join(ok, "bband")
        hits = hits.join(ok, "bband")
    # Self-pairs (__bid == __hid) are impossible for legitimate input (ids
    # are unique across state and batch) — they arise ONLY from ghost state
    # rows a crash-replayed streaming trigger left behind (bands/docs
    # written, digest ledger not — streaming/corpus.py's write order).
    # Without this filter a replayed batch doc meets its own ghost band
    # rows at Jaccard 1.0 and is silently dropped, so the ledger is never
    # backfilled — the admitted doc vanishes from the drained output
    # permanently. Filtering self-pairs (plus excluding batch ids from the
    # history DOC side below) makes every crash window replay to exactly
    # the original admitted set (pinned in tests/test_properties.py).
    cand_hist = (
        bk_h.join(hits, "bband")
        .where(F.col("__bid") != F.col("__hid"))
        .select("__bid", "__hid")
        .distinct()
        .localCheckpoint(eager=False)
    )
    # distinct AFTER the candidate semi-join (r10): a crash-replayed
    # streaming trigger can leave duplicate rows in the docs/bands state
    # faces (streaming/corpus.py writes the digest ledger last), and a
    # duplicated history doc would double its shingle rows — doubling its
    # Jaccard size and intersection counts and shifting jacc_r. Deduping
    # here costs a shuffle of |collision candidates| rows only (never the
    # corpus), making duplicate state rows semantics-free by construction.
    # Exclude phase-1 SURVIVOR ids from the history DOC side (legitimately
    # a no-op — state and batch ids are disjoint): a ghost history doc
    # that is also a digest-novel batch doc would otherwise contribute a
    # second copy of its shingles to sh_all (sh_b already carries every
    # survivor), doubling its sizes and distorting every jacc_r it appears
    # in — over-dropping near the threshold on replay. Pairs whose __hid
    # is a survivor are still verified, against the single batch-side
    # copy, which is exactly the true Jaccard. Survivors, NOT all batch
    # ids: a redelivered doc whose digest is already ledgered is dropped
    # in phase 1 and absent from sh_b, so its history copy is the only
    # one — excluding it would un-verify its pairs and re-admit its
    # near-dups (the redelivery-admits-nothing property).
    hist_docs = state_docs.select(
        F.col(id_col), F.coalesce(F.col(text_col), F.lit("")).alias(text_col)
    ).join(
        cand_hist.select(F.col("__hid").alias(id_col)).distinct(), id_col
    ).join(keep1.select(id_col), id_col, "left_anti").distinct()
    # checkpoint the combined shingle-ARRAY frame: jaccard_verify consumes
    # it three times (sizes + both intersection joins) and the history
    # side would otherwise re-run its semi-join + shingle extraction per
    # consumption (sets_b is already materialized above); sizes are
    # row-local from the arrays — no groupBy over the combined frame
    sets_all = shingle_sets(hist_docs, id_col, text_col, n).unionByName(
        sets_b
    ).localCheckpoint(eager=False)
    sh_all = sets_all.select(
        F.col(id_col), F.explode("__shset").alias("shingle")
    )
    sizes_all = sets_all.select(
        F.col(id_col), F.size("__shset").alias("sz")
    )
    dropped_hist = jaccard_verify(
        cand_hist.select(
            F.col("__hid").alias("id_a"), F.col("__bid").alias("id_b")
        ),
        sh_all,
        id_col,
        threshold,
        sizes=sizes_all,
        sets=sets_all,
    ).select(F.col("id_b").alias(id_col)).distinct()
    kept2 = kept.join(dropped_hist, id_col, "left_anti").localCheckpoint(
        eager=False
    )

    # phase 3: within-batch candidates among the history-clean docs only
    # (a history-dropped doc is never admitted, so it cannot block anyone
    # — sequential semantics), then greedy admission
    bk2 = bk.join(kept2.select(id_col), id_col)
    pairs = _pairs_from_band_keys(
        bk2.select(id_col, "band", "bkey"), id_col, max_bucket_size
    )
    edges = jaccard_verify(
        pairs, sh_b, id_col, threshold, sizes=sizes_b, sets=sets_b
    ).select(F.col("id_a").alias("lo"), F.col("id_b").alias("hi"))
    admitted = admit_sequential(
        kept2.select(id_col), edges, id_col, mis_max_iter
    )
    return keep1.join(admitted, id_col).select(
        F.col(id_col), F.col("__dg").alias("text_hash")
    )


def shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document, via array transform —
    no Python, one explode."""
    idx = ", ".join(f"toks[i+{j}]" for j in range(n))
    return (
        df.select(
            F.col(id_col),
            F.split(F.col(text_col), " ").alias("toks"),
        )
        # sequence(0, negative) counts DOWN in Spark — a doc shorter than n
        # tokens would emit spurious partial shingles instead of none
        .where(F.size("toks") >= n)
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(0, size(toks)-{n}), i -> concat_ws(' ', {idx}))"
                    )
                )
            ).alias("shingle"),
        )
        .where(F.col("shingle").isNotNull())
    )


def shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Per-document distinct-shingle ARRAY — the pre-explode form of
    :func:`shingles` (r16 optimization round): ``(id, __shset)`` such that
    ``sets.select(id, explode(__shset))`` is row-identical to
    ``shingles(df)``. Checkpointing THIS frame instead of the exploded one
    lets consumers derive both the exploded rows (map-only explode) and
    the per-doc set size (row-local ``size(__shset)``) without the
    groupBy-count shuffle ``jaccard_verify`` otherwise pays over the full
    shingle frame — one whole-corpus aggregation removed per verify
    (guide §2.4), identical values by construction."""
    idx = ", ".join(f"toks[i+{j}]" for j in range(n))
    return (
        df.select(
            F.col(id_col),
            F.split(F.col(text_col), " ").alias("toks"),
        )
        .where(F.size("toks") >= n)
        .select(
            F.col(id_col),
            # the size guard is REPEATED inside the expression: when a
            # downstream explode is collapsed into this projection the
            # optimizer can evaluate it on rows the Filter would have
            # dropped (observed: Generate pushed through a Union), and a
            # sub-n token array would then index out of bounds under ANSI
            # — the CASE makes the expression total; surviving rows are
            # untouched. The null filter mirrors shingles()'s post-explode
            # isNotNull guard (defensive: concat_ws over in-bounds tokens
            # is never NULL, but the two forms must stay row-identical by
            # construction, not by argument).
            F.filter(
                F.array_distinct(
                    F.expr(
                        f"CASE WHEN size(toks) >= {n} THEN "
                        f"transform(sequence(0, size(toks)-{n}), i -> concat_ws(' ', {idx})) "
                        f"ELSE array() END"
                    )
                ),
                lambda x: x.isNotNull(),
            ).alias("__shset"),
        )
    )


def _shingle_ids(sh: DataFrame, hash_mode: str, p: int = MINHASH_P) -> DataFrame:
    """Attach an integer shingle id (mod ``p``).

    - ``poly`` (default; ``dict`` accepted as a legacy alias): polynomial
      rolling hash of the shingle string, per-char fold mod P — pure
      narrow column arithmetic (NO dictionary, NO global sort, NO join)
      and bit-identical in any engine, so the oracle mirrors it directly;
    - ``xxhash64``: one JVM hash call — fastest, engine-specific, for
      pipelines that never need cross-engine reproduction.
    """
    if hash_mode == "xxhash64":
        return sh.withColumn("sid", F.pmod(F.xxhash64("shingle"), F.lit(p)))
    if hash_mode not in ("poly", "dict"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    # empty-string guard: sequence(1,0) would COUNT DOWN in Spark and the
    # mirrored list_reduce would fold an empty list in the oracle; the
    # bigint accumulator keeps h*31 exact for p up to 2^31-1
    sid = F.expr(
        f"CASE WHEN length(shingle) = 0 THEN cast(0 as bigint) ELSE "
        f"aggregate(sequence(1, length(shingle)), cast(0 as bigint), "
        f"(h, i) -> pmod(h * 31 + pmod(ascii(substring(shingle, i, 1)), {p}), {p})) END"
    )
    return sh.withColumn("sid", sid)


def minhash_signatures(
    sh_ids: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
) -> DataFrame:
    """One row per (doc, hash_j): minhash_j = min((A_j*sid + B_j) mod P).
    A_j = 2j+3, B_j = 5j+7. Long format — the audit/diagnostic shape that
    :func:`lsh_candidate_pairs` / :func:`lsh_dropped_buckets` consume;
    the production pipeline (:func:`minhash_near_dups`) uses the
    value-identical wide form below, which shuffles 12× less."""
    hashes = F.explode(
        F.expr(
            f"transform(sequence(0, {num_hashes - 1}),"
            f" j -> struct(j as j, pmod((2*j+3)*sid + 5*j+7, {MINHASH_P}) as h))"
        )
    ).alias("jh")
    return (
        sh_ids.select(F.col(id_col), hashes)
        .select(F.col(id_col), F.col("jh.j").alias("j"), F.col("jh.h").alias("h"))
        .groupBy(id_col, "j")
        .agg(F.min("h").alias("mh"))
    )


def minhash_signatures_wide(
    sh_ids: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 12,
) -> DataFrame:
    """One row per doc with ``num_hashes`` minhash COLUMNS (mh0..mhN) from a
    single groupBy — same values as :func:`minhash_signatures`, but no 12×
    row explode and no (doc, j) shuffle: the hash-min aggregation ships one
    narrow row per doc per partition through map-side partial min (the same
    columnar-votes shape ``simhash_signatures`` uses, where the explode form
    measured ~4× slower). sid < P keeps (2j+3)*sid exact in long math."""
    aggs = [
        F.min(
            F.pmod((2 * j + 3) * F.col("sid") + (5 * j + 7), F.lit(MINHASH_P))
        ).alias(f"mh{j}")
        for j in range(num_hashes)
    ]
    return sh_ids.groupBy(id_col).agg(*aggs)


def _band_keys(
    sigs: DataFrame, id_col: str, rows_per_band: int
) -> DataFrame:
    """(id, band, bkey) from LONG-format signatures — one bucket key per
    (doc, band); costs a (doc, band) groupBy shuffle."""
    # collect_list order is nondeterministic — order the band key by j
    return (
        sigs.withColumn("band", (F.col("j") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("j"), F.col("mh")))
                    ),
                    lambda s: s["mh"].cast("string"),
                ),
                "_",
            ).alias("bkey")
        )
    )


def _band_keys_wide(
    sigs_wide: DataFrame, id_col: str, rows_per_band: int, num_hashes: int
) -> DataFrame:
    """(id, band, bkey) from WIDE signatures — the band key is a row-local
    concat of the band's minhash columns plus a small fixed explode: NO
    shuffle at all, identical key strings to :func:`_band_keys`."""
    bands = num_hashes // rows_per_band
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_",
                *[
                    F.col(f"mh{b * rows_per_band + i}").cast("string")
                    for i in range(rows_per_band)
                ],
            ).alias("bkey"),
        )
        for b in range(bands)
    ]
    return sigs_wide.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signature (bands × rows_per_band), bucket-join on the band
    key, emit distinct candidate pairs (id_a < id_b). The join is the LSH
    trick: only same-bucket docs ever meet, so cost scales with bucket sizes,
    not n^2.

    ``max_bucket_size`` is the hot-bucket guard: one degenerate bucket (a
    boilerplate band key shared by B docs) makes the self-join emit B² pairs
    — AQE's skew split spreads the shuffle but cannot shrink the pair count.
    With the cap set, buckets over the threshold are SKIPPED before the
    join (same pattern as the n-gram doc-frequency cap below): a bucket that
    common is near-certainly boilerplate collision, and genuinely similar
    docs still meet in their other, less-degenerate bands. Use
    :func:`lsh_dropped_buckets` to surface exactly what a given cap drops —
    capping must never be silent. Default None = exact; production default
    1000 (what curation/curate_corpus and the *_capped query run — pinned
    equal to exact mode by the oracle at test scale).

    The band COUNT is derived from the signature rows themselves
    (band = j // rows_per_band), so there is no separate ``bands``
    argument that could silently disagree with the data's banding."""
    band_key = _band_keys(sigs, id_col, rows_per_band)
    return _pairs_from_band_keys(band_key, id_col, max_bucket_size)


def _pairs_from_band_keys(
    band_key: DataFrame, id_col: str, max_bucket_size: int | None
) -> DataFrame:
    """Bucket self-join over (band, bkey) rows → distinct candidate pairs.

    Always prunes singleton buckets: they can't form pairs, and dropping
    them BEFORE the self-join shrinks both join inputs and the distinct —
    measured ~25% faster than joining them through, with zero semantic
    change (the r5 bench showed capped mode beating "exact" mode purely
    because of this filter).

    r16 (optimization round, guide §2.4): the bucket-size filter is a
    WINDOW count over (band, bkey), not a groupBy + join-back — one
    shuffle of the band-key frame establishes the partitioning, the
    filter runs in place, and the self-join's two sides share that same
    hash partitioning (one physical exchange via reuse). The old
    agg-then-join form paid the aggregate's shuffle AND a join back
    whose build side is O(distinct buckets) — far beyond broadcast
    range at corpus scale, where it degraded to a second full
    sort-merge pass. Identical pairs (window count == group count;
    measured ×0.8 at sf0.1 on top of the scale fix).

    r17 (VERDICT r16 #1, guide §2.5): the window form stays ONLY for the
    uncapped path. With a cap set it was a skew hazard: ``count(1) over
    (partition by band, bkey)`` forces every row of a bucket into ONE
    window partition BEFORE the ``bsz <= cap`` filter can drop it, and
    AQE can split skewed join partitions but never a window partition —
    one degenerate boilerplate band bucket spills/OOMs that task at
    100 TB, which is precisely the population the cap exists to kill.
    The capped path now counts per-key populations with a map-side
    partial aggregate (the monster bucket folds to one row per map task
    and never co-locates) and removes the over-cap keys with a BROADCAST
    anti-join — by pigeonhole at most n/max_bucket_size keys exceed the
    cap, so the broadcast side is bounded by row count / cap, never by
    distinct-bucket count. Singleton buckets then die in the self-join
    itself (a 1-row bucket yields no ``id_a < id_b`` pair), so the
    ``bsz >= 2`` prefilter — a performance-only row cut — is dropped on
    this path rather than re-attached through an O(collision buckets)
    join-back. Pair set identical on both paths by construction; capped
    ≡ window-form pinned in tests/test_lsh_cap.py, skewed-bucket
    linearity probed by tools/scale_probe.py (lsh_hot_bucket)."""
    if max_bucket_size is not None:
        over = (
            band_key.groupBy("band", "bkey")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .where(F.col("bsz") > max_bucket_size)
            .select("band", "bkey")
        )
        pruned = band_key.join(
            F.broadcast(over), ["band", "bkey"], "left_anti"
        )
        l = pruned.select(F.col(id_col).alias("id_a"), "band", "bkey")
        r = pruned.select(F.col(id_col).alias("id_b"), "band", "bkey")
        return (
            l.join(r, ["band", "bkey"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
    from pyspark.sql import Window as _W

    sized = band_key.withColumn(
        "bsz", F.count(F.lit(1)).over(_W.partitionBy("band", "bkey"))
    ).where(F.col("bsz") >= 2)
    l = sized.select(F.col(id_col).alias("id_a"), "band", "bkey")
    r = sized.select(F.col(id_col).alias("id_b"), "band", "bkey")
    return (
        l.join(r, ["band", "bkey"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_dropped_buckets(
    sigs: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """(band, bkey, bsz) for every bucket the cap in
    :func:`lsh_candidate_pairs` would skip — the audit face of the cap, so
    a capped run can report WHAT it declined to compare instead of silently
    under-reporting duplicates."""
    return (
        _band_keys(sigs, id_col, rows_per_band)
        .groupBy("band", "bkey")
        .agg(F.count(F.lit(1)).alias("bsz"))
        .where(F.col("bsz") > max_bucket_size)
    )


# A/B hook (r16 optimization round, batch 2): True = callers passing the
# shingle-ARRAY frame (``sets=``) verify pairs with a row-local
# size(array_intersect(A, B)) after two id-keyed joins — no shingle
# explode, no (id, shingle)-keyed join, no groupBy over the pair×shingle
# expansion. False = the original exploded-join intersection for those
# callers too. Identical jacc_r decisions — pinned in
# tests/test_properties.py.
JACCARD_ARRAY_INTERSECT = True


def jaccard_verify(
    pairs: DataFrame,
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.6,
    sizes: DataFrame | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only. Intersection via
    shingle join, union by |A|+|B|−∩; rounded before thresholding so the
    decision is reproducible across engines.

    ``sizes`` (r16): optional precomputed ``(id, sz)`` per-doc distinct-
    shingle counts. Callers holding the :func:`shingle_sets` array form
    pass the row-local ``size(__shset)`` projection and skip the groupBy
    aggregation over the full shingle frame — at 100 TB that aggregation
    shuffles one row per corpus document for a verify that touches only
    the candidate docs. Value-identical: the exploded row count per doc
    IS the array size.

    ``sets`` (r16 batch 2): the :func:`shingle_sets` array frame itself.
    When given (and ``JACCARD_ARRAY_INTERSECT``), the verify attaches
    each pair's two DISTINCT-shingle arrays by two id-keyed joins and
    computes ∩ as ``size(array_intersect(A, B))`` row-locally — the
    exploded form's (id_b, shingle)-keyed join (which first expands each
    pair to |A| rows) and its groupBy(id_a, id_b) disappear. Identical
    decisions: arrays are distinct per doc, so the intersect size equals
    the old per-pair matched-shingle count; docs with no shingles
    (< n tokens) are absent from BOTH frames, so inner-join semantics
    match; and the jacc_r arithmetic is the same integer division.
    ``sh``/``sizes`` are ignored on this path."""
    if sets is not None and JACCARD_ARRAY_INTERSECT:
        a = sets.select(
            F.col(id_col).alias("id_a"), F.col("__shset").alias("__sa")
        )
        b = sets.select(
            F.col(id_col).alias("id_b"), F.col("__shset").alias("__sb")
        )
        inter = F.size(F.array_intersect("__sa", "__sb"))
        # drop zero-overlap pairs BEFORE the threshold filter (r17,
        # ADVICE r16): the exploded-join path drops them structurally
        # (no shingle row survives its inner join), so this keeps the
        # two paths row-identical for EVERY threshold, including the
        # degenerate threshold <= 0 — value-identical for all callers
        # (0.6–0.8), zero plan cost (one row-local predicate).
        return (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .select(
                "id_a",
                "id_b",
                (
                    F.floor(
                        inter
                        / (F.size("__sa") + F.size("__sb") - inter)
                        * 10000
                    )
                    / 10000
                ).alias("jacc_r"),
                inter.alias("__inter"),
            )
            .where((F.col("__inter") > 0) & (F.col("jacc_r") >= threshold))
            .select("id_a", "id_b", "jacc_r")
        )
    if sizes is None:
        sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        pairs.join(sh.select(F.col(id_col).alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sza")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("szb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.floor(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")) * 10000
            ) / 10000).alias("jacc_r"),
        )
        .where(F.col("jacc_r") >= threshold)
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.6,
    hash_mode: str = "poly",
    shingle_partitions: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """shingle → minhash → LSH bands → verified near-dup pairs.
    ``max_bucket_size`` caps degenerate LSH buckets (see
    lsh_candidate_pairs; pair with lsh_dropped_buckets for an audit of
    what a cap skips). Default None = exact.

    Materialization is ``localCheckpoint`` (not ``persist``): the verify
    join reads the shingle and pair frames multiple times, and lineage
    truncation additionally stops AQE from re-analyzing the whole
    shingle→signature→band tree at every downstream shuffle stage — the
    same driver-planning bottleneck measured on the cascade (see
    plans/pipeline.py module doc).

    The shingle-set frame is hash-repartitioned on the doc id before the
    checkpoint ONLY when its natural partitioning is narrower than the
    target: the downstream per-character polynomial hash is the CPU-heavy
    step, and a small corpus read from few parquet splits would otherwise
    run it on as few cores (measured: 3 tasks on 32 cores). When the
    input already has more partitions (the 100 TB case) no repartition —
    and no shuffle — happens at all.

    Measured-and-rejected (r6): a fully ROW-LOCAL band-key path (per-row
    shingle array → sid array → 12 array-min hashes → band keys in one
    projection, zero shuffles before the bucket join — the rewrite that
    took SimHash 4.5 s → 1.4 s) ran 10–20% SLOWER here in an interleaved
    A/B at sf0.1: unlike SimHash, the shingle explode must exist anyway
    for the exact-Jaccard verify, so the row-local form pays the shingle
    extraction twice and trades ONE saved shuffle for interpreted
    higher-order-function evaluation of the 12 hash minima, while this
    path's signature aggregation is whole-stage-codegen'd."""
    # r16: the checkpointed frame is the per-doc shingle ARRAY, not the
    # exploded rows — the exploded form is a map-only explode away for
    # the signature pipeline and the verify's intersection joins, and the
    # per-doc set size becomes a row-local size(__shset) instead of a
    # groupBy-count over the whole shingle frame (one corpus-wide
    # aggregation removed from every near-dup run; bit-identical, the
    # explode of the array IS the old frame row-for-row)
    sets_base = shingle_sets(df, id_col, text_col, n)
    target = (
        shingle_partitions or df.sparkSession.sparkContext.defaultParallelism
    )
    if sets_base.rdd.getNumPartitions() < target:
        sets_base = sets_base.repartition(target, F.col(id_col))
    sets = sets_base.localCheckpoint(eager=False)
    sh = sets.select(F.col(id_col), F.explode("__shset").alias("shingle"))
    sizes = sets.select(F.col(id_col), F.size("__shset").alias("sz"))
    # wide signature path: ONE groupBy(doc) with 12 min columns + row-local
    # band keys — two fewer shuffles than the long (doc,j) form, same values
    sigs_wide = minhash_signatures_wide(
        _shingle_ids(sh, hash_mode), id_col, num_hashes
    )
    # checkpoint the (bands-per-doc) band-key rows: the bucket-pair stage
    # consumes them three times (size filter + both self-join sides), and
    # each consumption would otherwise recompute the signature aggregation
    band_key = _band_keys_wide(
        sigs_wide, id_col, num_hashes // bands, num_hashes
    ).localCheckpoint(eager=False)
    # candidate pairs are tiny (bucket collisions only) but sit on top of
    # the whole signature pipeline — materialize once
    pairs = _pairs_from_band_keys(
        band_key, id_col, max_bucket_size
    ).localCheckpoint(eager=False)
    return jaccard_verify(pairs, sh, id_col, threshold, sizes=sizes, sets=sets)


def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "poly",
) -> DataFrame:
    """64-bit SimHash over unigram tokens with term-frequency weights.

    Bit k of the signature is 1 iff the ±1 vote sum over token
    occurrences is positive, where token t votes by the parity of the
    double-round hash ``((sid·(A1+k) mod P) · (A2+k)) mod P`` with
    P = 2^31-1 — 64 well-mixed 1-bit hashes of the 31-bit token id, all
    in exact BIGINT range on any engine.

    Physical shape: the WHOLE signature is one row-local projection — zero
    shuffles, zero explodes. Each row's token array maps to a token-id
    array (the per-char polynomial fold runs once per occurrence, inside
    the row), and each of the 64 vote sums is an integer fold over that id
    array; the signature assembles from the 64 sums in the same
    projection. At 100 TB this is a map-only stage that inherits the
    scan's partitioning — the only shuffles in the whole near-dup pipeline
    are the downstream block-bucket join's. Result-identical to the
    earlier explode → per-occurrence hash → (doc,sid) groupBy → 64-column
    groupBy(doc) form (vote sums are order-independent integer additions
    over the same per-occurrence parities) but without that form's two
    whole-corpus shuffles, which dominated wall time: measured 4.5 s →
    ~2.5 s at sf0.1. Two earlier rejected reorderings of the shuffle form
    (hash-after-count-groupBy, pre-hash widening) are moot now — there is
    nothing left to shuffle."""
    if hash_mode == "xxhash64":
        sid_of = f"pmod(xxhash64(t), {SIMHASH_SID_P})"
    elif hash_mode in ("poly", "dict"):
        # same per-char fold as _shingle_ids (empty-string guard included)
        sid_of = (
            f"CASE WHEN length(t) = 0 THEN cast(0 as bigint) ELSE "
            f"aggregate(sequence(1, length(t)), cast(0 as bigint), "
            f"(h, i) -> pmod(h * 31 + pmod(ascii(substring(t, i, 1)),"
            f" {SIMHASH_SID_P}), {SIMHASH_SID_P})) END"
        )
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    sids = F.expr(
        f"transform(split({text_col}, ' '), t -> {sid_of})"
    ).alias("__sids")

    def vote_sum(k: int) -> str:
        # fold the ±1 parity votes of every occurrence for bit k
        parity = (
            f"pmod(pmod(s * ({SIMHASH_A1} + {k}), {SIMHASH_SID_P})"
            f" * (cast({SIMHASH_A2} as bigint) + {k}), {SIMHASH_SID_P}) % 2"
        )
        return (
            f"aggregate(__sids, cast(0 as bigint), (acc, s) -> "
            f"acc + CASE WHEN {parity} = 1 THEN 1 ELSE -1 END)"
        )

    # bit 63's place value is min-long (two's complement) — 1<<63 doesn't
    # fit a positive BIGINT literal in any engine
    def place(k: int) -> int:
        return -(1 << 63) if k == SIMHASH_BITS - 1 else 1 << k

    sig = " + ".join(
        f"CASE WHEN {vote_sum(k)} > 0 THEN cast({place(k)} as bigint) "
        f"ELSE cast(0 as bigint) END"
        for k in range(SIMHASH_BITS)
    )
    base = df.select(F.col(id_col), F.col(text_col))
    # widen ONLY when the corpus arrives in fewer splits than the cluster
    # has cores: the 64 per-row vote folds are the CPU cost, and a
    # few-split corpus would run them on as few tasks (measured: 3 of 32).
    # Shuffling the raw (id, text) rows is cheap; at 100 TB the scan
    # already has more partitions than cores and this is a no-op, keeping
    # the stage map-only on the scale path.
    target = df.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < target:
        base = base.repartition(target)
    return base.select(F.col(id_col), sids).select(
        F.col(id_col), F.expr(sig).cast("long").alias("simhash")
    )


def simhash_blocks(sigs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Explode each 64-bit signature into its 4 disjoint 16-bit blocks as
    (id, simhash, b, bval) rows — the LSH-style bucket key. The mask makes
    the arithmetic shift's sign-fill irrelevant, so Spark and SQL agree on
    negative signatures."""
    mask = (1 << SIMHASH_BLOCK_BITS) - 1
    return sigs.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {SIMHASH_BLOCKS - 1}),"
                f" b -> struct(b as b,"
                f" (shiftright(simhash, {SIMHASH_BLOCK_BITS}*b) & {mask}) as bval))"
            )
        ).alias("bb"),
    ).select(F.col(id_col), "simhash", F.col("bb.b").alias("b"), F.col("bb.bval").alias("bval"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_mode: str = "poly",
) -> DataFrame:
    """4-block pigeonhole blocking over 64-bit signatures: a pair within
    Hamming distance 3 differs in at most 3 of the 4 disjoint 16-bit
    blocks, so it MUST agree on at least one — only docs sharing a
    (block index, block value) bucket ever meet, and the bucket space is
    4 × 2^16, so bucket sizes (and join cost) shrink with corpus entropy
    instead of collapsing into 256 mega-buckets like a high-byte scheme.
    Exact Hamming ≤ max_hamming via bit_count(xor) on the survivors."""
    if max_hamming >= SIMHASH_BLOCKS:
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming < {SIMHASH_BLOCKS}"
        )
    sigs = simhash_signatures(df, id_col, text_col, hash_mode).localCheckpoint(
        eager=False
    )
    blocks = simhash_blocks(sigs, id_col)
    l = blocks.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "b", "bval"
    )
    r = blocks.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "b", "bval"
    )
    return (
        l.join(r, ["b", "bval"])
        .where(F.col("id_a") < F.col("id_b"))
        # a close pair can collide in several blocks — dedup before scoring
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("sh_a ^ sh_b")).cast("long"))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_clusters(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
    check_every: int = 3,
) -> DataFrame:
    """Connected components over near-dup pairs: every document gets the
    MIN id reachable through the pair graph as its ``cluster_id`` — the
    step that turns pairwise matches into keep-one-per-cluster decisions.

    Iterative min-label propagation TO CONVERGENCE in pure DataFrame ops:
    each round joins current labels across the (symmetrized) edge list,
    takes the elementwise min, and stops when a round changes nothing —
    so the result is the exact fixpoint (what the SQL oracle's recursive
    closure computes) for any component shape, not just short chains.
    Rounds needed = max min-label eccentricity ≈ component diameter.
    ``max_iter`` is a loud safety bound, not a silent truncation. Each
    round is one join + one groupBy on the id key, and labels are
    localCheckpoint'ed so round N+1 plans against a leaf, not N stacked
    joins.

    Convergence is counted every ``check_every`` rounds, not every round:
    labels are MONOTONE (only ever decrease), so "the latest round changed
    nothing" certifies the fixpoint regardless of what the uncounted
    rounds in between did. A long-chain graph therefore costs
    ~1/check_every as many driver actions (the uncounted rounds fuse into
    the next count's job), trading at most check_every−1 cheap no-op
    rounds after convergence.

    ``ids``: one row per document id (the universe — singletons keep
    themselves as cluster_id)."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = ids.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("lbl")
    ).localCheckpoint(eager=False)
    converged = False
    for rnd in range(1, max_iter + 1):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(
                neighbor_min, labels["node"] == neighbor_min["src"], "left"
            )
            .select(
                labels["node"].alias("node"),
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))
                ).alias("lbl"),
                (F.coalesce(F.col("nlbl"), F.col("lbl")) < F.col("lbl")).alias(
                    "__chg"
                ),
            )
            .localCheckpoint(eager=False)
        )
        if rnd % check_every == 0 or rnd == max_iter:
            changed = new_labels.where(F.col("__chg")).count()
            if changed == 0:
                labels = new_labels.drop("__chg")
                converged = True
                break
        labels = new_labels.drop("__chg")
    if not converged:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} rounds — "
            "component diameter exceeds the safety bound; raise max_iter"
        )
    return labels.select(F.col("node").alias(id_col), F.col("lbl").alias("cluster_id"))


def dedup_clusters_star(
    pairs: DataFrame,
    ids: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds —
    the O(log n)-round production path for graphs whose diameter makes
    per-hop min-label propagation (``dedup_clusters``) too slow. Same
    output contract: every document labeled with the MIN id reachable
    through the pair graph ("Connected Components in MapReduce and
    Beyond", Kiveris et al., SOCC'14).

    Per round: large-star rewires every node's LARGER neighbors to the
    minimum of its neighborhood; small-star rewires the smaller ones.
    Both are one groupBy + one join on the node key — no global
    structure, so a 1000-executor cluster partitions each round by node
    id. Edges double-halve toward a star forest rooted at each
    component's minimum in O(log n) rounds regardless of diameter.

    Convergence is an exact set-fixpoint test, reached cheaply: each round
    pays ONE driver action — a (count, xxhash64-sum) fingerprint of the new
    edge set folded into the same job that materializes it — and only when
    the fingerprint repeats does the exact ``exceptAll`` confirmation run
    (once, at the probable fixpoint; a fingerprint collision merely costs
    one extra confirm). The previous implementation ran count + count +
    exceptAll per round — three job launches whose driver latency dominated
    wall time at bench scale (star was 1.4× plain propagation at sf0.1
    despite doing asymptotically less work). ``max_iter`` is a loud safety
    bound like the propagation variant's.

    Drift watch closed (r8): driver warm-mins rose two rounds running
    (r5 3.67 → r6 4.38 → r7 4.79 s), flagged as possible regression.
    Interleaved A/B against ``dedup_clusters`` as control (4 reps, one
    session, sf0.1, load ~2.5): star 3.50 s min vs control 3.31 s —
    at the r5 level, 1.06× the control, no mechanism. The trend was
    ambient load compounding across rounds; tools/bench_drift.py now
    makes the per-query comparison automatic so a real one is caught in
    one round."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .where(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", F.col("u")).alias("m"))
        )
        # no distinct here: duplicate (u, v) rows are harmless to
        # small_star (its groupBy-min ignores them and its final distinct
        # removes them) and skipping it saves one shuffle per round
        return (
            sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        # input oriented u > v; m = min of u's smaller neighborhood
        m = e.groupBy("u").agg(F.min("v").alias("m"))
        rewired = (
            e.join(m, "u")
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_edge = m.select("u", F.col("m").alias("v"))
        return rewired.unionAll(self_edge).distinct()

    def fingerprint(e: DataFrame) -> tuple:
        # one action: materializes the checkpoint AND returns the probe
        # DECIMAL(38,0) sum: a long sum of full-range xxhash64 values
        # overflows int64 (ANSI mode raises) after a handful of rows
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    # prev_fp starts unknown — fingerprinting the INPUT would cost one
    # extra job on every run just to detect the (never-in-practice) case
    # of an input already at fixpoint, which instead costs one extra round
    prev_fp: tuple | None = None
    converged = False
    for _ in range(max_iter):
        new_edges = small_star(large_star(edges)).localCheckpoint(eager=False)
        fp = fingerprint(new_edges)
        if fp == prev_fp and new_edges.exceptAll(edges).count() == 0:
            edges = new_edges
            converged = True
            break
        edges, prev_fp = new_edges, fp
    if not converged:
        raise RuntimeError(
            f"dedup_clusters_star did not converge in {max_iter} rounds"
        )
    labels = edges.groupBy("u").agg(F.min("v").alias("lbl"))
    return (
        ids.select(F.col(id_col).alias("node"))
        .join(labels, F.col("node") == F.col("u"), "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("lbl"), F.col("node")).alias("cluster_id"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 50,
    shingle_partitions: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup via shingle inverted index. Shingles
    with document frequency > max_df are dropped from the *index* (classic
    stop-shingle removal — bounds bucket blowup); Jaccard is computed over
    the capped shingle sets of both docs (consistent, engine-mirrorable).

    The shingle frame is checkpointed once (read three times: df-counts,
    both sides of the inverted-index join) and widened — never narrowed —
    to ``shingle_partitions`` (default: the cluster's parallelism) when a
    few-split corpus would otherwise run the per-character shingle work
    on a handful of cores. The shingle identity that shuffles (df
    groupBy, cap join, inverted-index self-join) is the 128-bit two-lane
    xxhash64 composite, not the raw n-token string — the
    ``duplicate_spans`` shuffle-byte treatment; a collision could only
    merge two shingles' df counts (collision odds ~N²/2¹²⁹). Interleaved
    A/B at sf0.1 measured neutral wall-clock (3.29 vs 3.31 s min —
    stage latency dominates at test scale); the change is for shuffle
    BYTES, which shrink several-fold on long shingles at 100 TB."""
    sh_base = shingles(df, id_col, text_col, n).select(
        F.col(id_col),
        F.xxhash64("shingle").alias("h1"),
        F.xxhash64(F.col("shingle"), F.lit(0x5EED)).alias("h2"),
    )
    target = (
        shingle_partitions or df.sparkSession.sparkContext.defaultParallelism
    )
    if sh_base.rdd.getNumPartitions() < target:
        sh_base = sh_base.repartition(target, F.col(id_col))
    sh = sh_base.localCheckpoint(eager=False)
    # r16 measured-and-rejected (guide §1.2 discipline): a window-count
    # df cap (the _pairs_from_band_keys rewrite) ran ×1.46 SLOWER here in
    # an interleaved A/B at sf0.1 (2.90 vs 4.24 s min) — this frame is
    # ~300k rows of near-unique hash keys, so the window's sort dwarfs
    # the hash-agg + join-back it would save; the band-key frame where
    # the rewrite wins is two orders smaller and post-aggregate.
    df_counts = sh.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("df_"))
    capped = sh.join(
        df_counts.where(F.col("df_") <= max_df), ["h1", "h2"]
    ).select(F.col(id_col), "h1", "h2", "df_")
    # Jaccard denominators count the FULL capped sets (including unique
    # shingles)…
    sizes = capped.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    # …but a df=1 shingle can never be SHARED, so it contributes nothing to
    # any intersection — drop the (majority) unique shingles from the
    # inverted-index self-join. Semantics-free, large input cut.
    joinable = capped.where(F.col("df_") >= 2).select(
        F.col(id_col), "h1", "h2"
    )
    inter = (
        joinable.select(F.col(id_col).alias("id_a"), "h1", "h2")
        .join(
            joinable.select(F.col(id_col).alias("id_b"), "h1", "h2"),
            ["h1", "h2"],
        )
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sza")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("szb")), "id_b")
        .select(
            "id_a",
            "id_b",
            (F.floor(
                F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")) * 10000
            ) / 10000).alias("jacc_r"),
        )
        .where(F.col("jacc_r") >= threshold)
    )


def source_overlap(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Inter-source exact-duplicate overlap matrix — the data-card signal
    for corpus composition: for every unordered pair of sources, the
    number of distinct content digests present in BOTH (e.g. how much of
    a new crawl is already covered by an existing dump — the first
    question before paying to dedup/train on it). Off-diagonal pairs
    only; per-source duplicate stats are ``corpus_datacard``'s job.

    Scale shape: (digest, source) distinct — one hash-aggregate on the
    md5 digest (the text never shuffles) → self-join keyed on digest,
    whose fanout per digest is (#sources containing it)², bounded by the
    source-count, never by corpus size → one (source_a, source_b)
    count aggregate. Mergeable across corpus partitions (distinct-union
    then recount), no all-pairs document join anywhere.

    NULL text digests as the empty string (r8 fix, same as
    leakage_safe_split): a NULL digest never matches the overlap
    self-join, so null-text rows silently dropped out of the matrix;
    they now count as empty-text content."""
    ds = (
        df.select(
            F.md5(
                F.coalesce(F.col(text_col), F.lit("")).cast("binary")
            ).alias("__dg"),
            F.col(source_col).alias("__src"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = ds.select("__dg", F.col("__src").alias("source_a"))
    b = ds.select("__dg", F.col("__src").alias("source_b"))
    return (
        a.join(b, "__dg")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def cluster_keepers_by_quality(
    clusters: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality_r",
) -> DataFrame:
    """Pick the KEEPER of every near-dup cluster by QUALITY instead of by
    min id — the decision production curation actually makes: near-dup
    clusters collapse to their best-scoring member, not their
    lowest-numbered one (reference parity: the reconciliation engine's
    duplicate arbitration keeps a deterministic winner per duplicate
    group, `src/reconciliatior.py:141-160`; this is the corpus-curation
    face of the same contract).

    ``clusters``: (id_col, cluster_id) — `dedup_clusters` /
    `dedup_clusters_star` output. ``scores``: (id_col, quality_col) —
    `fused_doc_scores`. Output: one row per cluster with the argmax-
    quality member (ties broken by MIN id so the answer is total-order
    deterministic), its score, and the member count.

    Scale shape: one equi-join on the id key + ONE aggregate on
    cluster_id — `max(struct(quality, -id))` computes the lexicographic
    argmax WITH map-side partial aggregation, so the shuffle carries one
    struct per (map partition, cluster), never the member list. A window
    (`row_number` over cluster) must shuffle every member and cannot
    partial-aggregate, and a corpus-sized degenerate cluster becomes one
    executor's sort; here it folds to one row per map task. The struct
    max is orderable-but-not-hashable, so Spark plans a SortAggregate —
    the per-partition sort is over narrow (cluster_id, struct) rows,
    measured noise-level at sf0.1 (`max_by` plans the identical
    SortAggregate; verified, not assumed)."""
    joined = clusters.join(scores.select(id_col, quality_col), id_col)
    best = F.max(
        F.struct(
            F.col(quality_col).alias("q"),
            (-F.col(id_col)).alias("negid"),
        )
    ).alias("__best")
    return (
        joined.groupBy("cluster_id")
        .agg(best, F.count(F.lit(1)).cast("long").alias("n_members"))
        .select(
            "cluster_id",
            (-F.col("__best.negid")).alias("keeper_id"),
            F.col("__best.q").alias("keeper_quality_r"),
            "n_members",
        )
    )
