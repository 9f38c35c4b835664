"""Smoke test of the protocol-eval sweep CLI (scripts/eval_all.py — the
reference's released-checkpoint sweep, /root/reference/scripts/eval_all.py)
and the pivot-table aggregator (scripts/protocol_table.py).

Runs the whole pipeline at toy scale on CPU: tiny game, zero net, a few
iterations/repeats; asserts the JSON schema the night-scale protocol
runs rely on.
"""
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_eval_all_and_protocol_table(tmp_path):
    out = tmp_path / "eval_tiny.json"
    cmd = [
        sys.executable, str(REPO / "scripts" / "eval_all.py"),
        "--games", "1x2", "--solvers", "fp", "--net", "zero",
        "--subgame-iters", "8", "--num-repeats", "2",
        "--platform", "cpu", "--f32", "--out", str(out),
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # Clean completion removes the streaming partial snapshot.
    assert not list(tmp_path.glob("eval_tiny.json.*partial"))
    rows = json.loads(out.read_text())
    assert len(rows) == 1
    row = rows[0]
    assert row["game"] == "1x2"
    assert row["solver"] == "fp"
    # full-tree exploitability of an 8-iteration FP solve is a positive
    # finite number well under the uniform strategy's.
    assert 0.0 < row["full_tree"] < 1.0
    assert 0.0 <= row["rebel"] < 2.0
    reports = row["sampled_reports"]
    assert reports[-1]["repeats"] == 2
    for rep in reports:
        assert {"repeats", "e0", "e1", "exploitability"} <= set(rep)
    # Phase-1 power-of-2 trajectory (recursive_eval.cc:283-301).
    assert len(row["full_trajectory"]) >= 3

    table = tmp_path / "PROTOCOL.md"
    cmd = [
        sys.executable, str(REPO / "scripts" / "protocol_table.py"),
        "--glob", str(out), "--out", str(table),
    ]
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=120
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    text = table.read_text()
    # Runs below the canonical 1024 repeats are annotated with their
    # actual repeat count so reduced-budget rows are never mistaken for
    # full-protocol numbers.
    assert "| 1x2 | fp (2 reps) |" in text
    assert "## Convergence in repeat count" in text


def test_run_eval_streams_partial_snapshots(tmp_path):
    """run_eval(partial_path=...) rewrites the snapshot after phase 1 and
    after every power-of-2 sampled report, so a timeout-killed protocol
    eval keeps everything it computed."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rebel_tpu.eval.recursive_eval import run_eval
    from rebel_tpu.games.liars_dice import LiarsDice
    from rebel_tpu.nets.value_nets import zero_value_fn
    from rebel_tpu.solving.params import SubgameSolvingParams

    game = LiarsDice(1, 2)
    params = SubgameSolvingParams(
        num_iters=8, max_depth=2, linear_update=True, use_cfr=True
    )
    partial = tmp_path / "snap.json"
    result = run_eval(
        game,
        params,
        zero_value_fn(game),
        subgame_iters=8,
        num_repeats=4,
        dtype=jnp.float32,
        partial_path=partial,
        net_name="ckpt/epoch10.params",
    )
    snap = json.loads(partial.read_text())
    assert snap["partial"] is True
    # Provenance: a table built from the snapshot alone can cite the
    # game/solver cell and the checkpoint that produced it.
    assert (snap["game"], snap["solver"]) == ("1x2", "cfr")
    assert snap["net"] == "ckpt/epoch10.params"
    # The last snapshot holds all power-of-2 reports and matches the
    # returned result.
    assert [r["repeats"] for r in snap["sampled_reports"]] == [1, 2, 4]
    assert snap["sampled_reports"] == result["sampled_reports"]
    assert snap["exploitability"]["repeated toleaf (partial)"] == (
        result["sampled_reports"][-1]["exploitability"]
    )
    assert len(snap["full_trajectory"]) >= 3


def test_protocol_table_partial_beats_lower_repeat_complete(tmp_path):
    """A streaming partial snapshot with MORE repeats than the best
    complete run must replace it in the table (a killed 1024-rep rerun
    at 512 repeats beats a finished 256-rep run); with FEWER repeats it
    must stay hidden."""
    def rec(reps):
        return {
            "full_tree": 0.05,
            "sampled_reports": [
                {"repeats": r, "e0": 0.0, "e1": 0.0,
                 "exploitability": 0.01, "ev_full": 0.0}
                for r in [2 ** k for k in range(reps.bit_length())]
                if r <= reps
            ],
            "full_trajectory": [{"iter": 1, "e0": 0, "e1": 0, "sum": 0}],
        }

    out = tmp_path / "eval_x.json"
    out.write_text(json.dumps([
        {"game": "2x3", "solver": "fp", "net": "n", "rebel": 0.01,
         **rec(256)}
    ]))
    (tmp_path / "eval_x.json.2x3-fp.partial").write_text(
        json.dumps({"partial": True, "exploitability":
                    {"full_tree": 0.05}, **rec(512)})
    )
    (tmp_path / "eval_x.json.2x3-cfr.partial").write_text(
        json.dumps({"partial": True, "exploitability":
                    {"full_tree": 0.002}, **rec(8)})
    )
    table = tmp_path / "T.md"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "protocol_table.py"),
         "--glob", str(out), "--out", str(table)],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    text = table.read_text()
    # fp: the 512-rep partial supersedes the 256-rep complete row.
    assert "fp (partial, 512 reps)" in text
    assert "fp (256 reps)" not in text
    # cfr: no complete row at all -> the 8-rep partial is surfaced.
    assert "cfr (partial, 8 reps)" in text


def test_sampled_eval_resume_matches_uninterrupted(tmp_path):
    """A phase-2 eval killed after N repeats and resumed from its
    accumulator snapshot must produce exactly the same final strategy
    and reports as one uninterrupted run (seeds are deterministic in
    the repeat index)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rebel_tpu.eval.recursive_eval import sampled_eval
    from rebel_tpu.games.liars_dice import LiarsDice
    from rebel_tpu.nets.value_nets import zero_value_fn
    from rebel_tpu.solving.params import SubgameSolvingParams

    game = LiarsDice(1, 2)
    params = SubgameSolvingParams(
        num_iters=8, max_depth=2, linear_update=True, use_cfr=True
    )
    vf = zero_value_fn(game)
    acc = tmp_path / "acc.npz"

    full, full_reports = sampled_eval(
        game, params, vf, 8, None, 2, jnp.float32, progress=False
    )
    # "Killed" run: 4 repeats, snapshotting to acc.
    sampled_eval(
        game, params, vf, 4, None, 2, jnp.float32, progress=False,
        acc_path=acc, acc_sig="t", max_chunk=2,
    )
    assert acc.exists()
    # Resume to 8.
    res, res_reports = sampled_eval(
        game, params, vf, 8, None, 2, jnp.float32, progress=False,
        acc_path=acc, acc_sig="t", resume=True, max_chunk=2,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(res))
    assert [r["repeats"] for r in res_reports] == [
        r["repeats"] for r in full_reports
    ]
    for a, b in zip(res_reports, full_reports):
        assert a["exploitability"] == b["exploitability"]
    # Mismatched signature refuses the snapshot and starts fresh.
    res2, _ = sampled_eval(
        game, params, vf, 8, None, 2, jnp.float32, progress=False,
        acc_path=tmp_path / "acc2.npz", acc_sig="other", resume=True,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(res2))


def test_resume_is_net_aware(tmp_path, caplog):
    """An accumulator belongs to ONE checkpoint's strategies: resuming
    under a different net must start fresh (blending two nets' policies
    into one protocol cell would silently corrupt it), while legacy
    snapshots written before the signature carried the net identity are
    grandfathered only when the partial JSON stamps the same net."""
    import logging

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rebel_tpu.eval.recursive_eval import run_eval
    from rebel_tpu.games.liars_dice import LiarsDice
    from rebel_tpu.nets.value_nets import zero_value_fn
    from rebel_tpu.solving.params import SubgameSolvingParams

    game = LiarsDice(1, 2)
    params = SubgameSolvingParams(
        num_iters=8, max_depth=2, linear_update=True, use_cfr=True
    )
    vf = zero_value_fn(game)
    partial = tmp_path / "snap.json"
    acc = tmp_path / "snap.json.acc.npz"
    kw = dict(subgame_iters=8, mdp_depth=2, dtype=jnp.float32,
              partial_path=partial, regret_summary_report=False)

    run_eval(game, params, vf, num_repeats=8, net_name="netA", **kw)
    assert acc.exists()

    def set_sig(sig):
        z = np.load(acc, allow_pickle=False)
        d = {k: z[k] for k in z.files}
        d["sig"] = sig
        with open(acc, "wb") as f:
            np.savez(f, **d)

    def messages():
        return [r.getMessage() for r in caplog.records]

    # Same net, net-aware sig: resumes.
    with caplog.at_level(logging.INFO):
        run_eval(game, params, vf, num_repeats=8, net_name="netA",
                 resume=True, **kw)
    assert any("resuming sampled eval at 8" in m for m in messages())

    # Legacy (pre-net) sig + matching stamped net: grandfathered.
    set_sig("1x2-cfr-8-8")
    caplog.clear()
    with caplog.at_level(logging.INFO):
        run_eval(game, params, vf, num_repeats=8, net_name="netA",
                 resume=True, **kw)
    assert any("resuming sampled eval at 8" in m for m in messages())

    # Legacy sig under a DIFFERENT net: refused, starts fresh.
    set_sig("1x2-cfr-8-8")
    caplog.clear()
    with caplog.at_level(logging.INFO):
        run_eval(game, params, vf, num_repeats=8, net_name="netB",
                 resume=True, **kw)
    assert not any("resuming sampled eval" in m for m in messages())
    assert any("does not match" in m for m in messages())


def test_f64_refused_off_cpu(monkeypatch):
    """float64 solving on a backend without real f64 arithmetic (TPU)
    silently truncates to f32 and NaNs out — ensure_dtype_support must
    refuse loudly instead of producing wrong numbers."""
    import jax
    import jax.numpy as jnp
    import pytest

    from rebel_tpu.eval.recursive_eval import ensure_dtype_support

    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    with pytest.raises(RuntimeError, match="no f64 arithmetic"):
        ensure_dtype_support(jnp.float64)
    # f32 never touches the backend check.
    ensure_dtype_support(jnp.float32)


def test_run_eval_max_chunk_invariance(tmp_path):
    """run_eval's --max-chunk knob (device lane batch of the sampled
    eval) must not change any result: the per-seed strategies are
    deterministic in the seed index regardless of how seeds are blocked
    onto the device (recursive_eval.py strat_reach_chunks)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rebel_tpu.eval.recursive_eval import run_eval
    from rebel_tpu.games.liars_dice import LiarsDice
    from rebel_tpu.nets.value_nets import zero_value_fn
    from rebel_tpu.solving.params import SubgameSolvingParams

    game = LiarsDice(1, 2)
    params = SubgameSolvingParams(
        num_iters=8, max_depth=2, linear_update=True, use_cfr=True
    )
    vf = zero_value_fn(game)
    outs = [
        run_eval(
            game, params, vf, subgame_iters=8, num_repeats=4,
            mdp_depth=2, dtype=jnp.float32, max_chunk=mc,
            regret_summary_report=False,
        )
        for mc in (None, 1, 4)
    ]
    ref = outs[0]["exploitability"]["repeated toleaf 4"]
    for o in outs[1:]:
        assert o["exploitability"]["repeated toleaf 4"] == ref
        assert o["exploitability"]["full_tree"] == (
            outs[0]["exploitability"]["full_tree"]
        )


def test_sampled_eval_resumes_from_mid_chunk_snapshot(tmp_path):
    """The accumulator now snapshots after every device chunk, not just
    at power-of-2 report boundaries — a run killed between the 4- and
    8-repeat reports resumes from the last chunk, not the last report."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rebel_tpu.eval.recursive_eval import sampled_eval
    from rebel_tpu.games.liars_dice import LiarsDice
    from rebel_tpu.nets.value_nets import zero_value_fn
    from rebel_tpu.solving.params import SubgameSolvingParams

    game = LiarsDice(1, 2)
    params = SubgameSolvingParams(
        num_iters=8, max_depth=2, linear_update=True, use_cfr=True
    )
    vf = zero_value_fn(game)
    acc = tmp_path / "acc.npz"

    full, full_reports = sampled_eval(
        game, params, vf, 8, None, 2, jnp.float32, progress=False
    )
    # 6 repeats in chunks of 3: the last snapshot lands at done=6,
    # which is not a power of 2.
    sampled_eval(
        game, params, vf, 6, None, 2, jnp.float32, progress=False,
        acc_path=acc, acc_sig="t", max_chunk=3,
    )
    z = np.load(acc, allow_pickle=False)
    assert int(z["done"]) == 6
    res, res_reports = sampled_eval(
        game, params, vf, 8, None, 2, jnp.float32, progress=False,
        acc_path=acc, acc_sig="t", resume=True, max_chunk=3,
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(res))
    # The truncated run also emitted its own end-of-run report at
    # repeats=6 (a real kill mid-run emits nothing extra); the
    # power-of-2 reports must match the uninterrupted run exactly.
    by_reps = {r["repeats"]: r["exploitability"] for r in res_reports}
    for r in full_reports:
        assert by_reps[r["repeats"]] == r["exploitability"]
