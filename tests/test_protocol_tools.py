"""Regression tests for the protocol-table tooling (scripts/).

The round-4 -> round-5 container reset exposed two silent failure
modes in the results pipeline (the analog of the reference's
``scripts/eval_all.py`` pivot, /root/reference/scripts/eval_all.py:124-158):

1. A fresh checkout gives every eval JSON the same mtime, under which
   the table's supersede-by-newest rule degenerated to alphabetical
   order and re-cited long-superseded cells.
2. Cited checkpoints whose params files were lost at the round
   boundary were presented as if still reproducible.

These tests pin the fixes: designation touches the best complete eval
per cell even under exactly-equal mtimes, and the generated table
annotates citations whose net file cannot be found.
"""

import importlib.util
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, REPO / "scripts" / f"{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _cell(game, solver, rebel, net, reps=1024):
    reports = [
        {"repeats": r, "exploitability": rebel, "ev_full": 0.0}
        for r in (1, reps)
    ]
    return [
        {
            "game": game,
            "solver": solver,
            "net": net,
            "full_tree": 0.001,
            "rebel": rebel,
            "sampled_reports": reports,
        }
    ]


def test_designate_best_touches_under_equal_mtimes(tmp_path):
    a = tmp_path / "eval_1x4f_cfr_old_1024rep.json"
    b = tmp_path / "eval_1x4f_cfr_new_1024rep.json"
    a.write_text(json.dumps(_cell("1x4", "cfr", 0.02, "old/epochA.params")))
    b.write_text(json.dumps(_cell("1x4", "cfr", 0.01, "new/epochB.params")))
    # Simulate a fresh checkout: identical mtimes on every file.
    t = 1_700_000_000
    os.utime(a, (t, t))
    os.utime(b, (t, t))

    _load("designate_best").main(results_dir=tmp_path)

    assert b.stat().st_mtime > a.stat().st_mtime, (
        "best cell must end strictly newest even when all mtimes tie"
    )


def test_designate_best_keeps_strictly_newest_best(tmp_path):
    a = tmp_path / "eval_1x4f_cfr_old_1024rep.json"
    b = tmp_path / "eval_1x4f_cfr_new_1024rep.json"
    a.write_text(json.dumps(_cell("1x4", "cfr", 0.02, "old/epochA.params")))
    b.write_text(json.dumps(_cell("1x4", "cfr", 0.01, "new/epochB.params")))
    t = 1_700_000_000
    os.utime(a, (t, t))
    os.utime(b, (t + 100, t + 100))
    before = b.stat().st_mtime

    _load("designate_best").main(results_dir=tmp_path)

    assert b.stat().st_mtime == before, "already-designated cell untouched"


def test_protocol_table_cites_designated_and_marks_lost_nets(tmp_path):
    res = tmp_path / "results"
    res.mkdir()
    # A real (existing) net file for the new cell.
    run = tmp_path / "run" / "ckpt"
    run.mkdir(parents=True)
    good_net = run / "epoch990.params"
    good_net.write_bytes(b"x")
    old = res / "eval_1x4f_cfr_old_1024rep.json"
    new = res / "eval_1x4f_cfr_new_1024rep.json"
    old.write_text(
        json.dumps(_cell("1x4", "cfr", 0.02, "gone/ckpt/epoch1.params"))
    )
    new.write_text(json.dumps(_cell("1x4", "cfr", 0.01, str(good_net))))
    t = 1_700_000_000
    os.utime(old, (t, t))
    os.utime(new, (t, t))
    out = tmp_path / "TABLE.md"

    env = dict(os.environ, PYTHONPATH=str(REPO))
    subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "designate_best.py"),
            "--results",
            str(res),
        ],
        check=True,
        env=env,
    )
    subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "protocol_table.py"),
            "--glob",
            str(res / "eval_*.json"),
            "--out",
            str(out),
        ],
        check=True,
        env=env,
    )
    text = out.read_text()
    # The designated (best) cell is cited in the headline table...
    (row,) = [
        line
        for line in text.splitlines()
        if line.startswith("| 1x4 | cfr |")
    ]
    assert "0.0100" in row and "epoch990.params" in row
    assert "(net lost)" not in row
    # ...and the sweep section marks the superseded cell's vanished net.
    assert "`run/epoch990.params` | 0.0100 | **yes**" in text
    assert "`gone/epoch1.params` (net lost) | 0.0200" in text


def test_designate_best_skips_records_with_lost_nets(tmp_path):
    lost = tmp_path / "eval_1x5f_cfr_lost_1024rep.json"
    live = tmp_path / "eval_1x5f_cfr_live_1024rep.json"
    net_dir = tmp_path / "run" / "ckpt"
    net_dir.mkdir(parents=True)
    (net_dir / "epoch990.params").write_bytes(b"x")
    # The lost record is BETTER but its net file is gone.
    lost.write_text(
        json.dumps(_cell("1x5", "cfr", 0.0148, "gone/ckpt/epoch930.params"))
    )
    live.write_text(
        json.dumps(
            _cell("1x5", "cfr", 0.0181, str(net_dir / "epoch990.params"))
        )
    )
    t = 1_700_000_000
    os.utime(lost, (t + 50, t + 50))  # lost record currently designated
    os.utime(live, (t, t))

    _load("designate_best").main(results_dir=tmp_path)

    assert live.stat().st_mtime > lost.stat().st_mtime, (
        "the reproducible record must hold the citation over a better "
        "but lost one"
    )


def test_dtype_ladder_groups_rungs_of_same_cell(tmp_path, monkeypatch):
    mod = _load("dtype_ladder")
    res = tmp_path / "results"
    (res / "f64").mkdir(parents=True)
    net = "exp/ckpt/epoch990.params"
    pallas = _cell("1x4", "cfr", 0.0076, net)
    pallas[0]["engine"] = "pallas"
    fast = _cell("1x4", "cfr", 0.0080, net)
    (res / "eval_1x4f_cfr_pal_1024rep.json").write_text(json.dumps(pallas))
    (res / "eval_1x4f_cfr_fast_1024rep.json").write_text(json.dumps(fast))
    (res / "f64" / "eval_1x4f_cfr_fast_1024rep.json").write_text(
        json.dumps(_cell("1x4", "cfr", 0.0085, net))
    )
    proto = res / "PROTOCOL.md"
    proto.write_text("# table\n")
    monkeypatch.setattr(mod, "_REPO", tmp_path)
    mod.main()
    text = proto.read_text()
    assert "## Engine/dtype ladder" in text
    assert "### 1x4 cfr (net `exp/epoch990.params`)" in text
    (row,) = [
        line
        for line in text.splitlines()
        if line.startswith("| rebel (1024 reps)")
    ]
    # Column order is sorted rung labels: fast f32, fast f64, pallas.
    assert row.split("|")[2:5] == [
        " 0.008000 ", " 0.008500 ", " 0.007600 "
    ]
    # Idempotent: rerunning replaces, not duplicates.
    mod.main()
    assert proto.read_text().count("## Engine/dtype ladder") == 1


def test_f64_footnote_pairs_nets_across_path_prefixes(tmp_path, monkeypatch):
    """The same net is cited as ``outputs/liars_sp/<exp>/...`` by
    round-4 evals and ``results/liars_sp/<exp>/...`` after the round-5
    tracking-policy move; the footnote must pair by exp-dir + filename,
    not by the raw path string (a raw-string compare silently dropped
    the refreshed epoch-990 cross-check in round 5)."""
    mod = _load("f64_footnote")
    res = tmp_path / "results"
    (res / "f64").mkdir(parents=True)
    f32 = _cell(
        "1x4", "cfr", 0.0076, "outputs/liars_sp/r4_1x4cfr/ckpt/epoch990.params"
    )
    f64 = _cell(
        "1x4", "cfr", 0.0080, "results/liars_sp/r4_1x4cfr/ckpt/epoch990.params"
    )
    (res / "eval_1x4f_cfr_r4b_1024rep.json").write_text(json.dumps(f32))
    (res / "f64" / "eval_1x4f_cfr_r4b_1024rep.json").write_text(
        json.dumps(f64)
    )
    proto = res / "PROTOCOL.md"
    proto.write_text("# table\n")
    monkeypatch.setattr(mod, "_REPO", tmp_path)
    monkeypatch.setattr(
        mod, "F32_GLOB", str(res / "eval_{cell}_1024rep.json")
    )
    monkeypatch.setattr(mod, "F64_DIR", res / "f64")
    mod.main()
    text = proto.read_text()
    assert "## f64 cross-check" in text
    assert "skipping" not in text
    assert "### 1x4 cfr" in text
    # A truly different net must still be refused: with no valid pair
    # left, main() declines to rewrite the footnote (the previous text
    # stays) rather than pairing mismatched nets.
    before = proto.read_text()
    other = _cell(
        "1x4", "cfr", 0.0080, "results/liars_sp/OTHER/ckpt/epoch990.params"
    )
    (res / "f64" / "eval_1x4f_cfr_r4b_1024rep.json").write_text(
        json.dumps(other)
    )
    mod.main()
    assert proto.read_text() == before
