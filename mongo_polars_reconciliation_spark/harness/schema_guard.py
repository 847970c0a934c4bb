"""Testdata schema-drift tripwire.

Round 3 burned a full round because the driver's ``events.ts`` column
changed parquet physical type (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)) and
the drift surfaced as 15 scattered test failures plus two SILENT wrong
answers. This module pins, per table, the set of physical types the engine
knows how to handle; :func:`assert_testdata_schema` reads only parquet
footers (pyarrow, no Spark job) and raises ONE error naming every drifted
column, so the next generation change fails loudly in one place.

The pin is a set, not a single type, exactly where the engine genuinely
handles multiple generations (``events.ts`` via functions/timenorm.py).
"""

from __future__ import annotations

import os

#: table -> column -> accepted pyarrow type strings. Columns not listed are
#: not load-bearing for type (strings stay strings in practice); every
#: column the engine does arithmetic/joins on IS listed.
_INT = {"int32", "int64"}  # join keys: either width casts losslessly
_STR = {"string", "large_string"}
_TS = {"timestamp[us]", "timestamp[ms]"}  # date-ish columns used via cast

EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": _INT, "r_name": _STR},
    "nation": {"n_nationkey": _INT, "n_regionkey": _INT, "n_name": _STR},
    "customer": {
        "c_custkey": _INT,
        "c_nationkey": _INT,
        "c_acctbal": {"double"},
        "c_mktsegment": _STR,
    },
    "supplier": {"s_suppkey": _INT, "s_nationkey": _INT, "s_acctbal": {"double"}},
    "part": {"p_partkey": _INT, "p_size": _INT, "p_retailprice": {"double"}},
    "orders": {
        "o_orderkey": _INT,
        "o_custkey": _INT,
        "o_totalprice": {"double"},
        "o_orderdate": _TS | {"timestamp[ns]", "date32[day]"},
    },
    "lineitem": {
        "l_orderkey": _INT,
        "l_partkey": _INT,
        "l_suppkey": _INT,
        "l_linenumber": _INT,
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_shipdate": _TS | {"timestamp[ns]", "date32[day]"},
    },
    "events": {
        "event_id": {"int64"},
        # the drift that cost round 3 — every type timenorm.py can absorb:
        "ts": {"int64"} | _TS | {"timestamp[ns]"},
        "user_id": {"int64"},
        "event_type": _STR,
        "value": {"double"},
        "props": _STR,
    },
    "documents": {
        "doc_id": {"int64"},
        "text": _STR,
        "lang": _STR,
        "source": _STR,
        "n_chars": {"int64"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {
            "list<element: float>",
            "list<item: float>",
            "list<element: double>",
            "list<item: double>",
        },
        "label": _INT,
    },
}


def check_testdata_schema(sf_dir: str) -> list[str]:
    """Return a list of human-readable drift findings (empty == clean)."""
    import pyarrow.parquet as pq

    problems: list[str] = []
    for table, cols in EXPECTED.items():
        path = f"{sf_dir}/{table}.parquet"
        if not os.path.exists(path):
            problems.append(f"{table}: file missing at {path}")
            continue
        schema = pq.read_schema(path)
        names = set(schema.names)
        for col, accepted in cols.items():
            if col not in names:
                problems.append(f"{table}.{col}: column missing")
                continue
            actual = str(schema.field(col).type)
            # tz-aware parquet timestamps (isAdjustedToUTC) are instants —
            # Spark reads them as TIMESTAMP_LTZ and timenorm converts them
            # exactly under the pinned UTC session, whatever tz string the
            # footer displays. Compare on the unit, not the tz annotation.
            if actual.startswith("timestamp[") and ", tz=" in actual:
                actual = actual.split(", tz=")[0] + "]"
            if actual not in accepted:
                problems.append(
                    f"{table}.{col}: type {actual!r} not in accepted "
                    f"{sorted(accepted)}"
                )
    return problems


def assert_testdata_schema(sf_dir: str) -> None:
    """Raise one error naming EVERY drifted column (not just the first) —
    the whole point is a single loud diagnosis instead of 15 scattered
    downstream failures."""
    problems = check_testdata_schema(sf_dir)
    if problems:
        raise AssertionError(
            f"testdata schema drift under {sf_dir} "
            f"({len(problems)} finding(s)):\n  " + "\n  ".join(problems)
        )
