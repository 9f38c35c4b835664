"""Solver tests ported from
/root/reference/csrc/liars_dice/subgame_solving_test.cc: terminal-value
oracle checks, FP/CFR convergence bounds, immediate-regret bounds,
zero-sum EV sanity, oracle-leaf depth-limited equivalence, query
round-trip, and safe normalization of 1e-81-scale vectors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rebel_tpu import LiarsDice, build_supertree, unroll_tree
from rebel_tpu.nets.value_nets import make_oracle_value_fn, zero_value_fn
from rebel_tpu.solving import queries as qmod
from rebel_tpu.solving.core import (
    REACH_EPS_F64,
    RootCtx,
    SolverContext,
    normalize_safe,
)
from rebel_tpu.solving.exploitability import (
    compute_ev2,
    compute_exploitability,
    compute_immediate_regrets,
    full_tree_context,
    uniform_beliefs,
)
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.solving.solver import SubgameSolver, build_solver

DT = jnp.float64


def solve_exploitability(game, params, value_fn=None, max_depth=None):
    """compute_fp_exploitability helper (subgame_solving_test.cc:26-45)."""
    tree = unroll_tree(game, max_depth=params.max_depth)
    ctx = SolverContext(game=game, tree=tree, dtype=DT)
    solver = SubgameSolver(
        ctx,
        params,
        RootCtx.concrete(tree),
        uniform_beliefs(game, DT),
        value_fn=value_fn,
    )
    solver.multistep()
    full_ctx = full_tree_context(game, DT)
    strategy = np.zeros((full_ctx.N, game.num_hands, game.num_actions))
    strategy[: ctx.N] = np.asarray(solver.get_strategy())
    return compute_exploitability(full_ctx, strategy)


# ------------------------------------------------------- terminal values
def win_probability(game, bet, beliefs, ctx, root):
    """compute_win_probability via the solver's terminal operator."""
    q, f = game.unpack_action(bet)
    m = game.matches_table[:, f]
    valid = (m[:, None] + m[None, :]) >= q  # [h, o]
    return (np.asarray(valid, np.float64) * np.asarray(beliefs)[None, :]).sum(-1)


@pytest.mark.parametrize("nd,nf", [(1, 6), (2, 3)])
def test_terminal_values_one_hot_beliefs(nd, nf):
    # subgame_solving_test.cc:48-104 — brute force vs the payoff tensor.
    game = LiarsDice(num_dice=nd, num_faces=nf)
    H = game.num_hands
    m = game.matches_table
    for ophand in range(H):
        for bet in range(game.num_actions - 1):
            q, f = game.unpack_action(bet)
            for myhand in range(H):
                matches = int(m[myhand, f] + m[ophand, f])
                true_win = 1.0 if matches >= q else 0.0
                # terminal_payoff = 2 * win - 1 against one-hot belief.
                got = game.terminal_payoff[bet, myhand, ophand]
                assert got == 2 * true_win - 1


def test_terminal_operator_in_context():
    """ctx.terminal_values == closed-form v = 2*P(win) - sum(op_reach),
    sign-flipped for the liar caller (subgame_solving.cc:80-98)."""
    game = LiarsDice(num_dice=1, num_faces=2)
    tree = unroll_tree(game)
    ctx = SolverContext(game=game, tree=tree, dtype=DT)
    root = RootCtx.concrete(tree)
    rng = np.random.RandomState(0)
    op_reach_full = jnp.asarray(rng.rand(ctx.N, ctx.H))
    tv = np.asarray(ctx.terminal_values(op_reach_full, jnp.int32(0), root))
    tids = tree.terminal_ids
    for row, t in enumerate(tids):
        bet = int(tree.challenged_bid[t])
        r = np.asarray(op_reach_full)[t]
        p_win = win_probability(game, bet, r, ctx, root)
        v = p_win * 2 - r.sum()
        term_player = (0 + int(tree.depth[t])) % 2
        if term_player != 0:
            v = -v
        np.testing.assert_allclose(tv[row], v, rtol=1e-12)


# ------------------------------------------------------------ convergence
def test_fp_one_dice_one_face():
    # subgame_solving_test.cc:106-123
    game = LiarsDice(num_dice=1, num_faces=1)
    params = SubgameSolvingParams(num_iters=3500, max_depth=100)
    value = solve_exploitability(game, params)
    assert 0.0 <= value < 1e-3


def test_fp_one_dice_one_face_linear():
    # subgame_solving_test.cc:125-143
    game = LiarsDice(num_dice=1, num_faces=1)
    params = SubgameSolvingParams(
        num_iters=3500, max_depth=100, linear_update=True
    )
    value = solve_exploitability(game, params)
    assert 0.0 <= value < 1e-3


def test_fp_one_dice_two_faces():
    # subgame_solving_test.cc:145-160
    game = LiarsDice(num_dice=1, num_faces=2)
    params = SubgameSolvingParams(num_iters=10000, max_depth=1000)
    value = solve_exploitability(game, params)
    assert 0.0 <= value < 1e-3


def test_cfr_one_dice_two_faces():
    # subgame_solving_test.cc:162-179
    game = LiarsDice(num_dice=1, num_faces=2)
    params = SubgameSolvingParams(
        num_iters=180, max_depth=1000, linear_update=True, use_cfr=True
    )
    value = solve_exploitability(game, params)
    assert 0.0 <= value < 1e-3


def test_fp_one_dice_three_faces_linear():
    # subgame_solving_test.cc:210-225
    game = LiarsDice(num_dice=1, num_faces=3)
    params = SubgameSolvingParams(
        num_iters=1 << 12, max_depth=1000, linear_update=True
    )
    value = solve_exploitability(game, params)
    assert 0.0 <= value < 2e-3


# ------------------------------------------------------ immediate regrets
def test_cfr_immediate_regrets():
    # subgame_solving_test.cc:181-208 — average immediate regret of the
    # CFR iterate sequence is bounded.
    game = LiarsDice(num_dice=1, num_faces=2)
    params = SubgameSolvingParams(
        num_iters=4000, max_depth=1000, use_cfr=True, linear_update=False
    )
    ctx = full_tree_context(game, DT)
    solver = build_solver(ctx, params)
    root = RootCtx.concrete(ctx.tree)
    state = solver.init(root, uniform_beliefs(game, DT))

    def body(carry, it):
        # Collect the sampling strategy *before* even-iteration steps
        # (subgame_solving_test.cc:194-198).
        strat = carry.last_strategies
        carry = solver.step(carry, it % 2, root)
        return carry, strat

    state, strategies = jax.lax.scan(
        body, state, jnp.arange(params.num_iters)
    )
    strategies = strategies[::2]
    regrets = np.asarray(compute_immediate_regrets(ctx, strategies))
    assert regrets.max() <= 1e-2


def test_immediate_regret_streaming_matches_one_shot():
    # The streaming block API (used by run_eval so device memory stays
    # bounded on big trees) must equal the one-shot computation.
    from rebel_tpu.solving.exploitability import immediate_regret_summary

    game = LiarsDice(num_dice=1, num_faces=2)
    params = SubgameSolvingParams(
        num_iters=8, max_depth=1000, use_cfr=True, linear_update=True
    )
    ctx = full_tree_context(game, DT)
    solver = build_solver(ctx, params)
    root = RootCtx.concrete(ctx.tree)
    state = solver.init(root, uniform_beliefs(game, DT))
    strategies = []
    for it in range(params.num_iters):
        strategies.append(np.asarray(state.last_strategies))
        state = solver.step(state, it % 2, root)
    stack = np.stack(strategies[::2])
    one_shot = np.asarray(compute_immediate_regrets(ctx, stack))
    flat = stack.reshape(stack.shape[0], -1)
    streamed = np.asarray(
        immediate_regret_summary(
            ctx, (flat[i : i + 3] for i in range(0, flat.shape[0], 3))
        )
    )
    np.testing.assert_allclose(streamed, one_shot, rtol=1e-12, atol=0)


def test_full_solve_cfr_iterates_flat_and_bounded():
    # full_solve(collect_iterates=True) returns flattened even-iteration
    # sampling strategies (the memory-bounded collection path that the
    # 2x3f protocol eval needs).
    from rebel_tpu.eval.recursive_eval import full_solve

    game = LiarsDice(num_dice=1, num_faces=2)
    params = SubgameSolvingParams(
        num_iters=8, max_depth=1000, use_cfr=True, linear_update=True
    )
    ctx = full_tree_context(game, DT)
    _, trajectory, iterates = full_solve(
        game, params, DT, progress=False, collect_iterates=True
    )
    assert len(iterates) == params.num_iters // 2
    assert all(i.shape == (ctx.N * ctx.H * ctx.A,) for i in iterates)
    assert trajectory[-1]["iter"] == params.num_iters


# --------------------------------------------------------------- zero sum
def test_fp_ev_zero_sum():
    # subgame_solving_test.cc:227-244
    game = LiarsDice(num_dice=1, num_faces=3)
    params = SubgameSolvingParams(
        num_iters=1 << 12, max_depth=1000, linear_update=True
    )
    ctx = full_tree_context(game, DT)
    solver = SubgameSolver(
        ctx, params, RootCtx.concrete(ctx.tree), uniform_beliefs(game, DT)
    )
    solver.multistep()
    strategy = solver.get_strategy()
    ev0, ev1 = compute_ev2(ctx, strategy, strategy)
    assert -2.0 <= ev0 <= 2.0
    assert abs(ev0 + ev1) < 1e-6


# -------------------------------------------------------------- oracle net
def test_depth_limited_with_oracle_net():
    # subgame_solving_test.cc:246-265 — depth-limited solving with oracle
    # leaf values matches full-solve quality.
    game = LiarsDice(num_dice=1, num_faces=3)
    params = SubgameSolvingParams(
        num_iters=1 << 10, max_depth=5, linear_update=True
    )
    oracle_params = params.replace(max_depth=50)
    net = make_oracle_value_fn(game, oracle_params, dtype=DT)
    value = solve_exploitability(game, params, value_fn=net)
    assert 0.0 <= value < 2e-3


def test_zero_net_runs():
    """ZeroOutputNet smoke (real_net.cc:30-55): depth-limited solving with
    zero leaf values runs and produces a valid strategy."""
    game = LiarsDice(num_dice=1, num_faces=4)
    params = SubgameSolvingParams(num_iters=64, max_depth=2, use_cfr=True,
                                  linear_update=True)
    tree = unroll_tree(game, max_depth=2)
    ctx = SolverContext(game=game, tree=tree, dtype=DT)
    solver = SubgameSolver(
        ctx, params, RootCtx.concrete(tree), uniform_beliefs(game, DT),
        value_fn=zero_value_fn(game),
    )
    solver.multistep()
    strat = np.asarray(solver.get_strategy())
    amask = np.asarray(ctx.action_masks(RootCtx.concrete(tree)))
    interior = tree.num_children > 0
    sums = strat.sum(-1)
    np.testing.assert_allclose(sums[interior], 1.0, atol=1e-9)
    assert np.all(strat[~np.broadcast_to(amask[:, None, :], strat.shape)] == 0)


def test_no_net_with_pseudo_leaves_raises():
    # subgame_solving.cc:177-186 — non-final leaf without a net throws.
    game = LiarsDice(num_dice=1, num_faces=4)
    tree = unroll_tree(game, max_depth=2)
    ctx = SolverContext(game=game, tree=tree, dtype=DT)
    params = SubgameSolvingParams(num_iters=2, max_depth=2)
    solver = SubgameSolver(
        ctx, params, RootCtx.concrete(tree), uniform_beliefs(game, DT)
    )
    with pytest.raises(ValueError, match="value net"):
        solver.multistep()


# ------------------------------------------------------------------ query
def test_query_roundtrip():
    # subgame_solving_test.cc:267-296 — over all non-terminal tree nodes.
    game = LiarsDice(num_dice=1, num_faces=3)
    tree = unroll_tree(game)
    H = game.num_hands
    beliefs1 = np.arange(H, dtype=np.float64)
    beliefs2 = np.arange(H, dtype=np.float64) + 0.5
    beliefs1 /= beliefs1.sum()
    beliefs2 /= beliefs2.sum()
    for traverser in (0, 1):
        for n in range(tree.num_nodes):
            if tree.is_terminal[n]:
                continue
            player = tree.node_player(n)
            query = qmod.get_query(
                game, traverser, int(tree.last_bid[n]), player,
                beliefs1, beliefs2,
            )
            assert query.shape == (game.query_size,)
            t2, bid2, p2, b1, b2 = qmod.deserialize_query(game, query)
            assert (t2, bid2, p2) == (traverser, int(tree.last_bid[n]), player)
            np.testing.assert_allclose(b1, beliefs1, atol=1e-6)
            np.testing.assert_allclose(b2, beliefs2, atol=1e-6)


def test_safe_normalization_tiny():
    # subgame_solving_test.cc:298-310 — 1e-81-scale vectors normalize to 1.
    probs = jnp.asarray(
        [2.93185e-81, 3.00956e-81, 3.17805e-81, 8.80785e-81], jnp.float64
    )
    out = normalize_safe(probs, REACH_EPS_F64)
    assert abs(float(out.sum()) - 1.0) < 1e-10


# ----------------------------------------------- supertree equivalence
def test_supertree_subgame_equals_concrete_tree():
    """Solving a subgame on the masked supertree must match solving it on
    a concretely-rooted tree — including the depth-1 liar terminal whose
    challenged bid is the *runtime* root bid (regression: this payoff was
    read from the virtual root's static bid)."""
    from rebel_tpu import build_supertree
    from rebel_tpu.solving.solver import CFRState

    game = LiarsDice(num_dice=1, num_faces=3)
    params = SubgameSolvingParams(
        num_iters=16, max_depth=2, use_cfr=True, linear_update=True
    )
    sup = build_supertree(game, 2)
    sup_ctx = SolverContext(game=game, tree=sup, dtype=DT)
    rng = np.random.RandomState(7)
    for root_bid in [0, 2, game.num_actions - 3]:
        beliefs = jnp.asarray(rng.dirichlet(np.ones(game.num_hands), size=2))
        conc = unroll_tree(game, root_bid=root_bid, root_player=1, max_depth=2)
        conc_ctx = SolverContext(game=game, tree=conc, dtype=DT)
        net = zero_value_fn(game)

        sup_solver = SubgameSolver(
            sup_ctx, params, RootCtx.of(game, root_bid, 1), beliefs, net
        )
        sup_solver.multistep()
        conc_solver = SubgameSolver(
            conc_ctx, params, RootCtx.concrete(conc), beliefs, net
        )
        conc_solver.multistep()

        np.testing.assert_allclose(
            np.asarray(sup_solver.get_hand_values(0)),
            np.asarray(conc_solver.get_hand_values(0)),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(sup_solver.get_hand_values(1)),
            np.asarray(conc_solver.get_hand_values(1)),
            atol=1e-12,
        )
        # Map supertree nodes onto concrete nodes and compare policies.
        from rebel_tpu.eval.recursive import _map_supertree_to_full

        m = _map_supertree_to_full(sup, conc, 0)
        valid = m >= 0
        np.testing.assert_allclose(
            np.asarray(sup_solver.get_strategy())[valid],
            np.asarray(conc_solver.get_strategy())[m[valid]],
            atol=1e-12,
        )
