"""Round-tooling behavior pins: the drift adjudicator's control
normalization (VERDICT r9 ask #7) must actually self-adjudicate a
uniformly-loaded session, and the record loaders must survive both full
records and truncated driver tails."""

import json
import subprocess
import sys


def _record(tmp_path, name, mins, control):
    doc = {
        "queries_min": mins,
        "secondary_min": {},
        "control_query": "q1_pricing_summary",
        "control_min_sec": control,
        "sf": 0.1,
    }
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


def _run_drift(old, new):
    return subprocess.run(
        [sys.executable, "/root/repo/tools/bench_drift.py", old, new],
        capture_output=True,
        text=True,
        check=True,
    ).stdout


def test_uniform_slowdown_self_adjudicates(tmp_path):
    """Every query 2x slower INCLUDING the control: raw comparison would
    flag the whole suite; control-normalized ratios are all 1.0 and
    nothing flags."""
    base = {"qa": 1.0, "qb": 2.0, "q1_pricing_summary": 0.5}
    slow = {k: v * 2 for k, v in base.items()}
    out = _run_drift(
        _record(tmp_path, "old.json", base, 0.5),
        _record(tmp_path, "new.json", slow, 1.0),
    )
    assert "handicap x2.00" in out
    assert "SLOWER" not in out
    assert "no query min regressed" in out


def test_real_regression_survives_normalization(tmp_path):
    """One query 4x slower on a session whose control is unchanged must
    still flag after normalization."""
    base = {"qa": 1.0, "qb": 2.0, "q1_pricing_summary": 0.5}
    new = dict(base, qa=4.0)
    out = _run_drift(
        _record(tmp_path, "old.json", base, 0.5),
        _record(tmp_path, "new.json", new, 0.5),
    )
    assert "SLOWER x4.00  qa" in out
    assert "qb" not in [l.split()[2] for l in out.splitlines() if "SLOWER" in l]


def test_control_recovered_from_truncated_tail(tmp_path):
    """Driver BENCH_r{N}.json tails truncate the JSON front; the control
    field must still be recovered by regex."""
    sys.path.insert(0, "/root/repo/tools")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bd", "/root/repo/tools/bench_drift.py"
    )
    bd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bd)
    p = tmp_path / "tail.json"
    p.write_text('...runcated {"control_min_sec": 0.75, "sf": 0.1}')
    assert bd.load_control(str(p)) == 0.75
