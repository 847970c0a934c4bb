"""Config-as-query-plan: the engine's frontend.

Mirrors the reference's ``ExpressionBuilder`` (src/expression_builder.py:6-75)
and ``config.py`` constants (src/config.py:10-43): a reconciliation run is
fully described by (a) N key-column pairs, (b) per-field type overrides,
(c) source filters, (d) tolerance / zero-effect rules. The reference compiles
these into Polars expressions + Mongo ``$project`` docs; here they compile
into column lists, cast maps and join conditions consumed by the operators.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class KeyPair:
    """One reconciliation key pair (reference: RC_KEYS_JSON, src/config.py:10-20).

    ``int_col`` names the column in internal table A, ``ext_col`` the column in
    external table B *before* prefixing. ``cast`` optionally aligns B's
    all-string CSV column with A's numeric type before the join
    (reference: cast_ext_exp, src/expression_builder.py:45-64).
    """

    int_col: str
    ext_col: str
    cast: str | None = None  # "double" | "long" | None


@dataclass(frozen=True)
class ToleranceRule:
    """|A.value − B.value| ≤ tolerance re-match rule on one key field
    (reference: tlr_rules, src/reconciliatior.py:96)."""

    field: str  # external-side field name, pre-prefix (e.g. "importe")
    tolerance: float


@dataclass(frozen=True)
class ZeroEffectRule:
    """Internal self-cancellation rule (reference: zero_effect_rules,
    src/reconciliatior.py:163-173): rows where ``field == values[0]`` join rows
    where ``field == values[1]`` on ``b1_cols`` vs ``b2_cols``; both members of
    each matched pair are removed from A before reconciliation."""

    field: str
    values: tuple[str, str]
    b1_cols: tuple[str, ...]
    b2_cols: tuple[str, ...]
    source: str = "a"


@dataclass
class ReconConfig:
    """Everything one reconciliation pass needs to compile its plan."""

    keys: list[KeyPair]
    id_col: str = "_id"  # A's natural key (stringified Mongo ObjectId)
    row_number_col: str = "file_row_number"  # B's synthetic 1-based row index
    ext_prefix: str = "ext_"  # applied to every B column on load
    key_copy_prefix: str = "exd_"  # join-key copies that survive the join
    # strict_compat=True reproduces the reference's faithful bugs
    # (src/reconciliatior.py:20-59): with k≥3 duplicate candidates only the
    # first (winner) and last (loser) rows are accounted for — middle
    # candidates vanish. False (default) sends every losing candidate back to
    # the external residual bucket.
    strict_compat: bool = False

    # ---- compiled column lists (reference: join_exp, expression_builder.py:22-27)

    @property
    def a_columns(self) -> list[str]:
        return [k.int_col for k in self.keys]

    @property
    def b_columns(self) -> list[str]:
        """B key columns as they appear after prefixing (``ext_<col>``)."""
        return [self.ext_prefix + k.ext_col for k in self.keys]

    @property
    def exd_columns(self) -> list[str]:
        """Key copies that survive the join (``exd_<col>``;
        reference: repeat_key_exp, src/expression_builder.py:66-69)."""
        return [self.key_copy_prefix + k.ext_col for k in self.keys]

    @property
    def ext_row_number_col(self) -> str:
        return self.ext_prefix + self.row_number_col

    def ext_to_exd(self, ext_col: str) -> str:
        return self.key_copy_prefix + ext_col.removeprefix(self.ext_prefix)

    def cast_map(self) -> dict[str, str]:
        """ext_col (pre-prefix) -> spark cast type, for numeric key alignment."""
        return {k.ext_col: k.cast for k in self.keys if k.cast}


@dataclass(frozen=True)
class SourceFilter:
    """Pushdown filter block for the internal scan (reference ``$match``:
    src/data_extractor.py:32-44 — equality on processor/country, ``$in`` on
    status, [from, to) range on create_timestamp). Expressed as a plain
    ``where`` next to the read so Catalyst pushes it into the scan."""

    equals: dict[str, object] = field(default_factory=dict)
    isin: dict[str, list] = field(default_factory=dict)
    # col -> (gte, lt); half-open range like the reference's $gte/$lt
    ranges: dict[str, tuple] = field(default_factory=dict)
