"""Tests for strategy stats and net-quality diagnostics
(subgame_solving.cc:823-899 / stats.cc:44-153 equivalents)."""

import jax.numpy as jnp
import numpy as np

from rebel_tpu import LiarsDice, unroll_tree
from rebel_tpu.eval.stats import compute_strategy_stats, eval_net
from rebel_tpu.nets.value_nets import make_oracle_value_fn, zero_value_fn
from rebel_tpu.solving.core import RootCtx
from rebel_tpu.solving.exploitability import full_tree_context, uniform_beliefs
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.solving.solver import SubgameSolver

DT = jnp.float64


def test_strategy_stats_uniform():
    game = LiarsDice(num_dice=1, num_faces=2)
    ctx = full_tree_context(game, DT)
    tree = ctx.tree
    # Uniform strategy over legal actions.
    amask = np.asarray(ctx.action_masks(RootCtx.concrete(tree)))
    strat = amask / np.maximum(amask.sum(-1, keepdims=True), 1)
    strat = np.broadcast_to(
        strat[:, None, :], (tree.num_nodes, game.num_hands, game.num_actions)
    )
    stats = compute_strategy_stats(ctx, strat)
    # Root: both players reach with their uniform beliefs.
    np.testing.assert_allclose(
        stats.reach_probabilities[:, 0], 1.0 / game.num_hands
    )
    assert abs(stats.node_reach[0] - 1.0) < 1e-9
    # node_reach at a depth-1 node = P(action) under uniform = 1/4.
    c0 = int(tree.children_begin[0])
    assert abs(stats.node_reach[c0] - 0.25) < 1e-9
    # Zero-sum at the root: v0 + v1 = 0 under identical beliefs.
    assert abs(stats.node_values[0][0] + stats.node_values[1][0]) < 1e-9


def test_strategy_stats_equilibrium_values():
    """At an (approximate) equilibrium, node_values[0][root] equals the
    game value and matches the solver's root values."""
    game = LiarsDice(num_dice=1, num_faces=2)
    ctx = full_tree_context(game, DT)
    params = SubgameSolvingParams(
        num_iters=512, max_depth=1000, linear_update=True
    )
    solver = SubgameSolver(
        ctx, params, RootCtx.concrete(ctx.tree), uniform_beliefs(game, DT)
    )
    solver.multistep()
    strat = np.asarray(solver.get_strategy())
    stats = compute_strategy_stats(ctx, strat)
    root_v = float(
        np.asarray(solver.get_hand_values(0)).mean()
    )  # uniform beliefs
    assert abs(stats.node_values[0][0] - root_v) < 5e-3
    assert abs(stats.node_values[0][0] + stats.node_values[1][0]) < 1e-9


def test_eval_net_oracle_near_zero():
    """A perfect oracle net must have ~zero MSE vs fresh BR solves."""
    game = LiarsDice(num_dice=1, num_faces=2)
    ctx = full_tree_context(game, DT)
    params = SubgameSolvingParams(
        num_iters=256, max_depth=1000, linear_update=True
    )
    solver = SubgameSolver(
        ctx, params, RootCtx.concrete(ctx.tree), uniform_beliefs(game, DT)
    )
    solver.multistep()
    full_strategy = np.asarray(solver.get_strategy())
    oracle = make_oracle_value_fn(
        game, SubgameSolvingParams(num_iters=256, max_depth=10000,
                                   linear_update=True),
        dtype=DT,
    )
    mse = eval_net(
        game, full_strategy, full_strategy, mdp_depth=2, fp_iters=256,
        value_fn=oracle, traverse_by_net=False, dtype=DT,
    )
    assert mse < 1e-6

    # The zero net has a real, nonzero MSE on the same nodes.
    mse_zero = eval_net(
        game, full_strategy, full_strategy, mdp_depth=2, fp_iters=256,
        value_fn=zero_value_fn(game), traverse_by_net=False, dtype=DT,
    )
    assert mse_zero > 1e-4


def test_print_strategy(tmp_path):
    """print_strategy output format (subgame_solving.cc:732-763)."""
    import io

    from rebel_tpu import unroll_tree
    from rebel_tpu.solving.printing import (
        print_strategy,
        print_strategy_to_file,
    )

    game = LiarsDice(num_dice=1, num_faces=2)
    tree = unroll_tree(game, max_depth=2)
    strat = np.full(
        (tree.num_nodes, game.num_hands, game.num_actions),
        1.0 / game.num_actions,
    )
    buf = io.StringIO()
    print_strategy(game, tree, strat, buf)
    out = buf.getvalue()
    assert out.startswith("Printing strategies per node")
    assert "Node=0" in out and "hand=0" in out
    path = tmp_path / "s.txt"
    print_strategy_to_file(game, tree, strat, str(path))
    assert path.read_text() == out
