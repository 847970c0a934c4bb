"""Exact multi-key match with deterministic duplicate arbitration.

Reference: ``Reconciliator.match_records`` + ``_process_duplicates``
(src/reconciliatior.py:66-74, 20-59) — SURVEY.md §2.3 J1 / §2.4.

Join shape: N-key inner equi-join A⋈B. Polars consumes the right-side key
columns; we reproduce that output schema by dropping B's ``ext_`` key columns
after the join (the ``exd_`` copies carry the values, exactly why the
reference creates them).

Arbitration: when one A row (``_id``) matches k>1 B rows, the reference keeps
the *first* candidate in join-output order and returns the *last* to the
external-residual bucket (middle candidates vanish — k≥3 bug). Join-output
order is incidental in Polars and nonexistent in Spark, so the engine's
contract is explicit: candidate order = ``ext_file_row_number`` ascending
(B's file order). ``strict_compat=True`` reproduces the middle-candidate
drop; default sends every loser back.

Scale notes: the join shuffles both sides on the key columns (sort-merge), or
broadcasts B when small — declared with ``broadcast_b=True`` or left to AQE.
Arbitration adds one extra shuffle on ``_id``; at 100 TB that window is
per-key-group (no global sort) and AQE handles skewed ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mongo_polars_reconciliation_spark.config import ReconConfig


def _join_cond(a: DataFrame, b: DataFrame, cfg: ReconConfig):
    return [
        a[ka] == b[kb] for ka, kb in zip(cfg.a_columns, cfg.b_columns, strict=True)
    ]


def match_candidates(
    a: DataFrame,
    b: DataFrame,
    cfg: ReconConfig,
    broadcast_b: bool = False,
    cache=None,
) -> DataFrame:
    """Inner-join A⋈B on the key pairs and rank each A row's candidates by
    B file order — the shared substrate for winners, losers AND residuals
    (one shuffle on the keys; everything downstream anti-joins this by
    single-column identity instead of re-shuffling A/B on the full keys)."""
    b_side = F.broadcast(b) if broadcast_b else b
    joined = a.join(b_side, _join_cond(a, b_side, cfg), "inner").drop(
        *[b_side[kb] for kb in cfg.b_columns]
    )
    order_col = cfg.ext_row_number_col
    w = Window.partitionBy(cfg.id_col).orderBy(F.col(order_col).asc_nulls_last())
    grp = Window.partitionBy(cfg.id_col)
    ranked = joined.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__cnt", F.count(F.lit(1)).over(grp)
    )
    if cache is not None:
        # winners, losers and both residual derivations read this frame —
        # materialize the join/window once
        ranked = cache(ranked)
    return ranked


def split_winners_losers(
    ranked: DataFrame, cfg: ReconConfig
) -> tuple[DataFrame, DataFrame]:
    """Split ranked candidates into ``(matched, loser_b_rows)``.

    ``matched``: one row per matched A row (winner candidate), schema =
    A columns + B's non-key ``ext_`` columns + ``exd_`` key copies.
    ``loser_b_rows``: losing B candidates reconstructed to the prepared-B
    schema (``ext_`` keys restored from ``exd_``, src/reconciliatior.py:44-51)
    — the caller appends them to the external residual bucket.
    """
    joined = ranked.drop("__rn", "__cnt")
    matched = ranked.where(F.col("__rn") == 1).drop("__rn", "__cnt")

    if cfg.strict_compat:
        # faithful bug: only the LAST candidate of each duplicated group goes
        # back; middles vanish (unique(keep="last"), reconciliatior.py:24-26)
        losers = ranked.where((F.col("__cnt") > 1) & (F.col("__rn") == F.col("__cnt")))
    else:
        losers = ranked.where(F.col("__rn") > 1)

    ext_cols = [c for c in joined.columns if c.startswith(cfg.ext_prefix)]
    exd_cols = [c for c in joined.columns if c.startswith(cfg.key_copy_prefix)]
    # restore ONLY the ext_ key columns this pass's join consumed: under a
    # reduced key set (cascade pass 2+) the other exd_ copies still have
    # their live ext_ column, and restoring those too would duplicate names
    restored = [
        exd
        for exd in exd_cols
        if cfg.ext_prefix + exd.removeprefix(cfg.key_copy_prefix) not in ext_cols
    ]
    loser_b = losers.select(
        *[F.col(c) for c in ext_cols],
        *[F.col(exd).alias(cfg.ext_prefix + exd.removeprefix(cfg.key_copy_prefix))
          for exd in restored],
        *[F.col(c) for c in exd_cols],
    )
    return matched, loser_b


def match_records(
    a: DataFrame,
    b: DataFrame,
    cfg: ReconConfig,
    broadcast_b: bool = False,
    cache=None,
) -> tuple[DataFrame, DataFrame]:
    """One-call form: ``(matched, loser_b_rows)`` (reference
    ``match_records`` + ``_process_duplicates``, src/reconciliatior.py:66-74,
    20-59). The pipeline uses the decomposed ``match_candidates`` +
    ``split_winners_losers`` so residuals can reuse the candidate frame."""
    ranked = match_candidates(a, b, cfg, broadcast_b=broadcast_b, cache=cache)
    return split_winners_losers(ranked, cfg)


# --- skew-hardened variant (r14, VERDICT r13 #2) ------------------------------


def hot_match_keys(
    a: DataFrame, b: DataFrame, cfg: ReconConfig, hot_threshold: int
) -> DataFrame:
    """Key tuples whose COMBINED row count (A side + B side) reaches
    ``hot_threshold`` — the keys whose sort-merge task would be a monster
    at scale (per-key join fanout nA·nB ≤ (combined/2)², so the combined
    count bounds it). SURVEY §4 names the reconciliation keys as
    skew-prone at 100× — VOID rows cluster on amounts, a hot settlement
    date dominates a day's file (reference keys: src/config.py:10-20).

    One union-all of the two key projections + one hash aggregate (map-side
    combine), mirroring the ingest kernel's ``combined_cap_keys``
    discipline: counting both sides, not just one, catches skew whichever
    side carries it. Returns the key frame A-named; it stays a DataFrame —
    never collected — and is broadcast by the caller for the semi/anti
    splits. NULL key components land in the frame harmlessly: equality
    semi-joins never match them, so NULL-keyed rows stay in the
    sort-merge branch, where the inner join drops them exactly as the
    unsalted join does."""
    ka = cfg.a_columns
    keys_a = a.select(*[F.col(c) for c in ka])
    keys_b = b.select(
        *[F.col(kb).alias(kaa) for kaa, kb in zip(ka, cfg.b_columns, strict=True)]
    )
    return (
        keys_a.unionByName(keys_b)
        .groupBy(*ka)
        .agg(F.count(F.lit(1)).alias("__nk"))
        .where(F.col("__nk") >= F.lit(hot_threshold))
        .select(*ka)
    )


def hot_match_keys_auto(
    a: DataFrame,
    b: DataFrame,
    cfg: ReconConfig,
    broadcast_budget_rows: int = 1_000_000,
    min_fanout: int = 32,
) -> DataFrame:
    """Budget-derived hot-key frame (r15, VERDICT r14 #4): makes the
    "hot keys are few and B's hot slice is broadcastable" contract of
    ``match_candidates_skewed`` a deterministic sizing rule instead of a
    hand-picked threshold. Pass the result as ``hot_keys=``.

    Rule: rank key tuples by combined A+B row count descending (ties
    broken by the key values, so the pick is deterministic), then keep
    the fattest keys while their CUMULATIVE B-side row count still fits
    ``broadcast_budget_rows`` — the budget bounds exactly what the hot
    branch broadcasts (B's hot slice), so the chosen set is
    broadcastable BY CONSTRUCTION. ``min_fanout`` floors the candidate
    set: keys below it never pay the split (the plain sort-merge handles
    them fine — NOTES_r14's fanout-light lesson).

    Candidate filters (r16, VERDICT r15 + ADVICE): before ranking, the
    rule drops key tuples that can never usefully occupy the budget —
    (1) tuples with any NULL component (the downstream equality
    semi-joins can never match them, so a large NULL cluster — missing
    amounts/codes are common in reconciliation feeds — must not crowd
    out real hot keys; NULL-keyed rows stay in the sort-merge branch
    either way, same as ``hot_match_keys``'s documented semantics);
    (2) tuples with ZERO B-side rows (nothing to broadcast, no match
    possible — admitting one spends a hot-key-frame slot for no pair
    fanout saved); (3) tuples whose B slice ALONE exceeds the budget
    (they can never be admitted, and under the old cumulative-prefix
    rule one un-broadcastable monster poisoned the running sum and
    disabled the split for every later key that DID fit — now it is
    skipped and fitting keys are still admitted). Residual conservatism,
    documented: within the individually-fitting set the rule still
    admits a maximal PREFIX, so if the prefix overflows at key i, later
    smaller keys are not back-filled (a true greedy knapsack is
    inherently sequential; the prefix rule never overfills and any
    prefix is a valid key-space partition, so this costs only optional
    coverage, never correctness).

    Scale bound (r16, VERDICT r15 #4 — unconditional, no longer a
    skewed-workload assumption): the surviving candidates are pre-pruned
    to the ``broadcast_budget_rows / min_fanout`` fattest keys by a
    distributed top-K (per-partition top-K + single-partition merge —
    ``TakeOrderedAndProject``, executor-side) BEFORE the cumulative
    window, so the global ranking window's input is aggregate-sized by
    construction even on an adversarial near-uniform fanout-``min_fanout``
    key distribution (previously n/min_fanout rows through one sorted
    partition). The cap is exact at the design point (every admitted key
    carries ≥ min_fanout B rows ⇒ the admitted prefix can never exceed
    cap keys); if a workload of sub-``min_fanout``-B keys would admit
    more, the rule conservatively keeps the cap-many fattest — still a
    prefix, still budget-respecting, and ``match_candidates_skewed`` is
    bit-identical under ANY key-space partition, so the truncation is
    semantics-preserving by construction.

    Everything stays a DataFrame — one union-all key aggregate (the same
    shape ``hot_match_keys`` builds, plus a per-side count), filters, a
    distributed top-K, one window — nothing is collected to the driver.
    Budget sizing: a broadcast row of the prepared-B schema is a few
    hundred bytes, so the 1M-row default targets the few-hundred-MB
    broadcast range; size it to executor memory, not to the data
    volume."""
    ka = cfg.a_columns
    keys_a = a.select(*[F.col(c) for c in ka]).withColumn("__b", F.lit(0))
    keys_b = b.select(
        *[F.col(kb).alias(kaa) for kaa, kb in zip(ka, cfg.b_columns, strict=True)]
    ).withColumn("__b", F.lit(1))
    non_null = F.lit(True)
    for c in ka:
        non_null = non_null & F.col(c).isNotNull()
    counts = (
        keys_a.unionByName(keys_b)
        .groupBy(*ka)
        .agg(
            F.count(F.lit(1)).alias("__nk"),
            F.sum("__b").alias("__nb"),
        )
        .where(F.col("__nk") >= F.lit(min_fanout))
        .where(non_null)
        .where(F.col("__nb") >= F.lit(1))
        .where(F.col("__nb") <= F.lit(broadcast_budget_rows))
    )
    order = [F.col("__nk").desc(), *[F.col(c).asc_nulls_last() for c in ka]]
    cap = max(1, broadcast_budget_rows // max(min_fanout, 1))
    pruned = counts.orderBy(*order).limit(cap)
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        pruned.withColumn("__cum_nb", F.sum("__nb").over(w))
        .where(F.col("__cum_nb") <= F.lit(broadcast_budget_rows))
        .select(*ka)
    )


def match_candidates_skewed(
    a: DataFrame,
    b: DataFrame,
    cfg: ReconConfig,
    hot_threshold: int | None = None,
    hot_keys: DataFrame | None = None,
    cache=None,
) -> DataFrame:
    """``match_candidates`` with a hot-key split plan: rows whose key tuple
    is HOT (combined count ≥ ``hot_threshold``, or caller-supplied
    ``hot_keys``) join via broadcast of B's hot slice; everything else
    takes the normal sort-merge path. Output is BIT-IDENTICAL to
    ``match_candidates`` — the split partitions the key space, an inner
    equi-join distributes over that partition, and every A ``_id``'s
    candidate group lives entirely inside one branch (an id has one key
    tuple). The branches are UNIONED first and then ONE arbitration
    window runs over the union (see the inline comment below) — do not
    refactor this into per-branch windows: ``__cnt`` would break if a
    group ever straddled branches.

    This is the salted-agg pattern applied to J1 (``functions/skew.py``
    handles aggregation; this handles the match join): AQE skew-join
    splitting is the first line of defense, but it only splits the
    STREAMED side of a sort-merge — a key hot on BOTH sides still builds
    its full fanout in one task's merge. Here the hot slice never enters
    the shuffle at all.

    Scale contract: ``hot_threshold`` must be set so the hot KEY count is
    small and B's hot slice fits in a broadcast (a few hot amounts/dates
    — millions of rows — is the design point; the threshold is a tuning
    knob, not auto-derived, so the plan is deterministic — see
    ``hot_match_keys_auto`` for a budget-derived rule). The hot-key
    frame itself is aggregate-sized and is broadcast for the semi/anti
    splits — nothing is collected to the driver.

    Input-materialization contract (r15, advice): this plan reads A and B
    THREE times each (the key aggregate, the semi/anti split, the match
    join) and the derived ``hot_keys`` aggregate feeds four joins whose
    broadcast exchanges are not all plan-identical (``hk_b`` is a
    different projection), so callers should ``persist``/
    ``localCheckpoint`` A and B before the skewed plan — otherwise the
    uncached inputs (and through them the key aggregate) can be
    recomputed per consumer at scale. The engine's own callers already
    comply: the cascade checkpoints its pass inputs
    (``plans/pipeline.py:_persist``) and the driver faces read the
    eagerly-checkpointed ``_ab`` fixture. A caller-supplied ``hot_keys``
    frame should likewise be materialized if its lineage is expensive.

    When to reach for it (measured, NOTES_r14): the split pays off on
    FANOUT-HEAVY hot keys — nA·nB large enough that one sort-merge task
    producing the pairs is the stage straggler (20k×2k ⇒ ×0.86 even on
    local[32], and the gap widens with executor count). A merely
    FREQUENT key with trivial fanout (1M×3) makes the split pure
    overhead (the arbitration window dominates and already
    distributes); leave those to the plain plan + AQE."""
    if hot_keys is None:
        if hot_threshold is None:
            raise ValueError("need hot_threshold or an explicit hot_keys frame")
        hot_keys = hot_match_keys(a, b, cfg, hot_threshold)
    hk_a = F.broadcast(hot_keys)
    # USING-join semantics pull the key columns to the front; re-select the
    # original order so both branches (and the plain plan) share one schema
    a_hot = a.join(hk_a, on=cfg.a_columns, how="left_semi").select(*a.columns)
    a_rest = a.join(hk_a, on=cfg.a_columns, how="left_anti").select(*a.columns)
    hk_b = F.broadcast(
        hot_keys.select(
            *[
                F.col(kaa).alias(kb)
                for kaa, kb in zip(cfg.a_columns, cfg.b_columns, strict=True)
            ]
        )
    )
    b_hot = b.join(hk_b, on=cfg.b_columns, how="left_semi").select(*b.columns)
    b_rest = b.join(hk_b, on=cfg.b_columns, how="left_anti").select(*b.columns)
    # The two match joins are built inline rather than through
    # ``match_candidates``: the split frames share the hot-key subtree, so
    # the analyzer de-duplicates the right side's expression IDs at join
    # time and ``match_candidates``' drop-by-parent-reference would
    # silently no-op, leaking B's key columns into the output. Key names
    # are prefix-disjoint from A's by construction (``prepare_external``),
    # so dropping by NAME is exact. One arbitration window then runs over
    # the union — identical discipline, one shuffle on the id.
    rest_joined = a_rest.join(b_rest, _join_cond(a_rest, b_rest, cfg), "inner")
    hot_joined = a_hot.join(
        F.broadcast(b_hot), _join_cond(a_hot, b_hot, cfg), "inner"
    )
    joined = rest_joined.unionByName(hot_joined).drop(*cfg.b_columns)
    order_col = cfg.ext_row_number_col
    w = Window.partitionBy(cfg.id_col).orderBy(F.col(order_col).asc_nulls_last())
    grp = Window.partitionBy(cfg.id_col)
    ranked = joined.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__cnt", F.count(F.lit(1)).over(grp)
    )
    if cache is not None:
        ranked = cache(ranked)
    return ranked


def match_records_skewed(
    a: DataFrame,
    b: DataFrame,
    cfg: ReconConfig,
    hot_threshold: int | None = None,
    hot_keys: DataFrame | None = None,
    cache=None,
) -> tuple[DataFrame, DataFrame]:
    """Skew-hardened ``match_records``: same ``(matched, loser_b_rows)``
    contract and bit-identical output (reference ``match_records``,
    src/reconciliatior.py:66-74 — the semantics don't change, only the
    physical join strategy under a hot key)."""
    ranked = match_candidates_skewed(
        a, b, cfg, hot_threshold=hot_threshold, hot_keys=hot_keys, cache=cache
    )
    return split_winners_losers(ranked, cfg)
