"""Recursive strategy-builder tests
(/root/reference/csrc/liars_dice/recursive_solving_test.cc:70-107) plus a
consistency check: recursive solving with full-depth subgames must equal a
single full solve."""

import jax.numpy as jnp
import numpy as np

from rebel_tpu import LiarsDice, unroll_tree
from rebel_tpu.nets.value_nets import zero_value_fn
from rebel_tpu.eval.recursive import (
    compute_sampled_strategy_recursive_to_leaf,
    compute_strategy_recursive,
    compute_strategy_recursive_to_leaf,
)
from rebel_tpu.solving.core import RootCtx, SolverContext
from rebel_tpu.solving.exploitability import (
    compute_exploitability,
    full_tree_context,
    uniform_beliefs,
)
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.solving.solver import SubgameSolver

DT = jnp.float64


def test_zero_net_compute_strategy():
    # recursive_solving_test.cc:70-83
    game = LiarsDice(num_dice=1, num_faces=3)
    params = SubgameSolvingParams(
        num_iters=100, max_depth=1, linear_update=True
    )
    strategy = compute_strategy_recursive(
        game, params, zero_value_fn(game), dtype=DT
    )
    full = unroll_tree(game)
    assert strategy.shape == (
        full.num_nodes,
        game.num_hands,
        game.num_actions,
    )
    # Interior nodes carry normalized policies.
    interior = full.num_children > 0
    np.testing.assert_allclose(strategy[interior].sum(-1), 1.0, atol=1e-9)


def test_zero_net_compute_strategy_to_leaf():
    # recursive_solving_test.cc:85-107
    game = LiarsDice(num_dice=1, num_faces=3)
    params = SubgameSolvingParams(
        num_iters=100, max_depth=3, linear_update=True
    )
    strategy = compute_strategy_recursive_to_leaf(
        game, params, zero_value_fn(game), dtype=DT
    )
    full = unroll_tree(game)
    assert strategy.shape == (
        full.num_nodes,
        game.num_hands,
        game.num_actions,
    )
    interior = full.num_children > 0
    np.testing.assert_allclose(strategy[interior].sum(-1), 1.0, atol=1e-9)


def test_recursive_full_depth_equals_single_solve():
    """With max_depth covering the whole game, the root subgame IS the
    full game: recursive-to-leaf must reproduce the single-solver
    strategy exactly."""
    game = LiarsDice(num_dice=1, num_faces=2)
    params = SubgameSolvingParams(
        num_iters=128, max_depth=100, linear_update=True
    )
    strategy = compute_strategy_recursive_to_leaf(game, params, dtype=DT)

    ctx = full_tree_context(game, DT)
    solver = SubgameSolver(
        ctx, params, RootCtx.concrete(ctx.tree), uniform_beliefs(game, DT)
    )
    solver.multistep()
    expect = np.asarray(solver.get_strategy())
    np.testing.assert_allclose(strategy, expect, atol=1e-12)


def test_sampled_recursive_strategy_quality():
    """Sampled recursive-to-leaf strategies on small games are playable:
    finite exploitability, valid distributions (mirrors the usage in
    recursive_eval.cc:344-363)."""
    game = LiarsDice(num_dice=1, num_faces=2)
    params = SubgameSolvingParams(
        num_iters=64, max_depth=2, linear_update=True, use_cfr=True
    )
    from rebel_tpu.nets.value_nets import make_oracle_value_fn

    oracle = make_oracle_value_fn(
        game, params.replace(max_depth=100), dtype=DT
    )
    strategy = compute_sampled_strategy_recursive_to_leaf(
        game, params, oracle, seed=1, dtype=DT
    )
    full = unroll_tree(game)
    interior = full.num_children > 0
    sums = strategy[interior].sum(-1)
    # Sampled stop-iteration can be 0 for CFR: sampling strategy is then
    # uniform, still a valid distribution.
    np.testing.assert_allclose(sums, 1.0, atol=1e-9)
    ctx = full_tree_context(game, DT)
    e = compute_exploitability(ctx, strategy)
    assert 0.0 <= e < 1.0


def test_batched_sampled_strategies_match_sequential():
    """The lockstep multi-repeat recursion (grid2 frontier engine) must
    reproduce the sequential per-seed recursion (supertree engine) lane
    for lane: same RNG draw order, cross-engine solver equality."""
    from rebel_tpu.eval.recursive import (
        compute_sampled_strategies_to_leaf_batch,
    )

    game = LiarsDice(num_dice=1, num_faces=4)
    params = SubgameSolvingParams(
        num_iters=16, max_depth=2, linear_update=True, use_cfr=True
    )
    vf = zero_value_fn(game)
    seeds = [0, 1, 2]
    batch = compute_sampled_strategies_to_leaf_batch(
        game, params, vf, seeds, dtype=DT
    )
    full = unroll_tree(game)
    nonterm = ~full.is_terminal
    for r, seed in enumerate(seeds):
        seq = compute_sampled_strategy_recursive_to_leaf(
            game, params, vf, seed=seed, dtype=DT
        )
        np.testing.assert_allclose(
            batch[r][nonterm], seq[nonterm], atol=1e-9
        )


def test_batched_sampled_eval_matches_sequential():
    """sampled_eval(batched=True) == sampled_eval(batched=False) at the
    report level (exploitability / EV per power-of-2 repeat count)."""
    from rebel_tpu.eval.recursive_eval import full_solve, sampled_eval

    game = LiarsDice(num_dice=1, num_faces=3)
    params = SubgameSolvingParams(
        num_iters=16, max_depth=2, linear_update=True, use_cfr=False
    )
    vf = zero_value_fn(game)
    full_strategy, _, _ = full_solve(game, params, DT, progress=False)
    fin_b, rep_b = sampled_eval(
        game, params, vf, 4, full_strategy, dtype=DT, progress=False,
        batched=True,
    )
    fin_s, rep_s = sampled_eval(
        game, params, vf, 4, full_strategy, dtype=DT, progress=False,
        batched=False,
    )
    assert [r["repeats"] for r in rep_b] == [r["repeats"] for r in rep_s]
    for rb, rs in zip(rep_b, rep_s):
        np.testing.assert_allclose(
            rb["exploitability"], rs["exploitability"], atol=1e-6
        )
        np.testing.assert_allclose(rb["ev_full"], rs["ev_full"], atol=1e-6)
    np.testing.assert_allclose(fin_b, fin_s, atol=1e-5)


def test_cfr_to_leaf_uses_average_strategy_beliefs():
    """Non-sampled CFR recursion must propagate beliefs with the AVERAGE
    strategy (recursive_solving.cc:96-102), not the last iterate; and it
    must not crash where zero-mass average-strategy paths abort the
    reference binary (docs/DEVIATIONS.md safe-normalization note)."""
    import jax.numpy as jnp
    import numpy as np

    from rebel_tpu.eval.recursive import (
        BatchSubgameSolver,
        compute_strategy_recursive_to_leaf,
    )
    from rebel_tpu.games.liars_dice import LiarsDice
    from rebel_tpu.nets.value_nets import make_oracle_value_fn
    from rebel_tpu.solving.exploitability import (
        compute_exploitability2,
        full_tree_context,
    )
    from rebel_tpu.solving.params import SubgameSolvingParams

    game = LiarsDice(1, 2)
    params = SubgameSolvingParams(
        num_iters=64, max_depth=2, linear_update=True, use_cfr=True
    )
    vf = make_oracle_value_fn(
        game, params.replace(max_depth=10**6), dtype=jnp.float64
    )
    # The solver exposes reaches under both candidate strategies; for
    # CFR they must differ (average vs last iterate).
    bs = BatchSubgameSolver(game, params, jnp.float64, vf)
    _, _, r_samp, r_avg = bs.solve(
        np.array([-1], np.int32), np.array([0], np.int32),
        np.full((1, 2, game.num_hands), 0.5),
    )
    assert np.abs(r_samp - r_avg).max() > 1e-3
    # End-to-end: oracle-leaf recursion stays sane and high quality.
    strat = compute_strategy_recursive_to_leaf(
        game, params, vf, use_sampling_strategy=False, dtype=jnp.float64
    )
    assert np.isfinite(strat).all()
    ctx = full_tree_context(game, jnp.float64)
    e0, e1 = compute_exploitability2(ctx, strat)
    assert (e0 + e1) / 2 < 0.05, (e0, e1)


def test_pallas_frontier_engine_matches_fast():
    """Grid2FrontierSolver(engine='pallas') — the fused-kernel eval
    path behind scripts/eval_all.py --engine pallas — must reproduce
    the default grid engine's sampled strategies lane for lane (same
    seeds, same recursion, f32 rounding only)."""
    import jax

    from rebel_tpu.eval.recursive import (
        Grid2FrontierSolver,
        compute_sampled_strategies_to_leaf_batch,
    )
    from rebel_tpu.nets.cfv_net import CFVNetSpec

    game = LiarsDice(num_dice=1, num_faces=2)
    params = SubgameSolvingParams(
        num_iters=8, max_depth=2, linear_update=True, use_cfr=True
    )
    spec = CFVNetSpec(game=game, n_hidden=16, n_layers=2)
    net_params = spec.init_params(jax.random.PRNGKey(0))
    vf = spec.value_fn(net_params)
    seeds = [0, 1, 2, 3]

    fast = compute_sampled_strategies_to_leaf_batch(
        game, params, vf, seeds, dtype=jnp.float32
    )
    fsolver = Grid2FrontierSolver(
        game, params, jnp.float32, vf,
        engine="pallas", net_params=net_params, lane_block=8,
        interpret=True,
    )
    pal = compute_sampled_strategies_to_leaf_batch(
        game, params, vf, seeds, dtype=jnp.float32, fsolver=fsolver
    )
    full = unroll_tree(game)
    nonterm = ~full.is_terminal
    np.testing.assert_allclose(
        pal[:, nonterm], fast[:, nonterm], atol=2e-5
    )


def test_pallas_frontier_engine_rejects_f64():
    from rebel_tpu.eval.recursive import Grid2FrontierSolver

    game = LiarsDice(num_dice=1, num_faces=2)
    params = SubgameSolvingParams(
        num_iters=8, max_depth=2, linear_update=True, use_cfr=True
    )
    import pytest

    with pytest.raises(ValueError, match="float32"):
        Grid2FrontierSolver(game, params, jnp.float64, None,
                            engine="pallas")
