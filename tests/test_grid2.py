"""Equivalence of the fast action-grid depth-2 solver with the generic
node-list solver (which is itself golden-tested against the reference).
Root values and valid-entry strategies must match exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rebel_tpu import LiarsDice, build_supertree
from rebel_tpu.nets.cfv_net import CFVNetSpec
from rebel_tpu.nets.value_nets import zero_value_fn
from rebel_tpu.solving.core import RootCtx, SolverContext
from rebel_tpu.solving.grid2 import Grid2Solver
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.solving.solver import build_solver

DT = jnp.float64


def grid_to_node(game, sup, g0, g1):
    """Map grid-layout strategies to the supertree node layout."""
    N, H, A = sup.num_nodes, game.num_hands, game.num_actions
    out = np.zeros((N, H, A))
    out[0] = np.asarray(g0)
    for a1 in range(A):
        n1 = int(sup.child_index[0, a1])
        if n1 >= 0:
            out[n1] = np.asarray(g1)[a1]
    return out


@pytest.mark.parametrize("use_cfr", [True, False])
@pytest.mark.parametrize("net", ["zero", "mlp"])
def test_grid2_matches_generic(use_cfr, net):
    game = LiarsDice(num_dice=1, num_faces=4)
    params = SubgameSolvingParams(
        num_iters=24, max_depth=2, linear_update=True, use_cfr=use_cfr
    )
    if net == "zero":
        value_fn = zero_value_fn(game)
    else:
        # f64 net: the grid solver evaluates the net on a dense (a1, a2)
        # batch while the generic solver uses the compact pseudo-leaf
        # list; in reduced precision the different batch shapes change
        # matmul accumulation order at the net's own noise floor.
        spec = CFVNetSpec(
            game=game, n_hidden=32, n_layers=2, compute_dtype=jnp.float64
        )
        p = spec.init_params(jax.random.PRNGKey(3))
        value_fn = spec.value_fn(p)

    sup = build_supertree(game, 2)
    ctx = SolverContext(game=game, tree=sup, dtype=DT)
    gen = build_solver(ctx, params, value_fn)
    grid = Grid2Solver(
        game=game, params=params, dtype=DT, value_fn=value_fn
    )

    rng = np.random.RandomState(11)
    for root_bid, root_player in [(-1, 0), (0, 1), (3, 0),
                                  (game.num_actions - 2, 1)]:
        beliefs = jnp.asarray(rng.dirichlet(np.ones(game.num_hands), size=2))
        root = RootCtx.of(game, root_bid, root_player)

        gstate = gen.init(root, beliefs)
        gstate = jax.jit(gen.multistep)(gstate, root)
        fstate = grid.init(root, beliefs)
        fstate = jax.jit(grid.multistep)(fstate, root)

        np.testing.assert_allclose(
            np.asarray(fstate.root_values_means),
            np.asarray(gstate.root_values_means),
            atol=1e-12,
            err_msg=f"values root_bid={root_bid}",
        )

        # Average strategies on valid entries.
        amask = np.asarray(ctx.action_masks(root))
        g_avg = np.asarray(gen.average_strategy(gstate, root))
        f0, f1 = grid.average_strategy(fstate, root)
        f_avg = grid_to_node(game, sup, f0, f1)
        valid = np.broadcast_to(amask[:, None, :], g_avg.shape)
        np.testing.assert_allclose(
            f_avg[valid], g_avg[valid], atol=1e-12,
            err_msg=f"avg root_bid={root_bid}",
        )

        # Sampling strategies on valid entries.
        g_samp = np.asarray(gen.sampling_strategy(gstate))
        s0, s1 = grid.sampling_strategy(fstate, root)
        f_samp = grid_to_node(game, sup, s0, s1)
        np.testing.assert_allclose(
            f_samp[valid], g_samp[valid], atol=1e-12,
            err_msg=f"samp root_bid={root_bid}",
        )


def test_grid2_dcfr_matches_generic():
    game = LiarsDice(num_dice=1, num_faces=3)
    params = SubgameSolvingParams(
        num_iters=16, max_depth=2, use_cfr=True, dcfr=True,
        dcfr_alpha=1.5, dcfr_beta=0.5, dcfr_gamma=2.0,
    )
    value_fn = zero_value_fn(game)
    sup = build_supertree(game, 2)
    ctx = SolverContext(game=game, tree=sup, dtype=DT)
    gen = build_solver(ctx, params, value_fn)
    grid = Grid2Solver(game=game, params=params, dtype=DT, value_fn=value_fn)
    root = RootCtx.of(game, 1, 0)
    beliefs = jnp.full((2, game.num_hands), 1.0 / game.num_hands)
    gstate = jax.jit(gen.multistep)(gen.init(root, beliefs), root)
    fstate = jax.jit(grid.multistep)(grid.init(root, beliefs), root)
    np.testing.assert_allclose(
        np.asarray(fstate.root_values_means),
        np.asarray(gstate.root_values_means),
        atol=1e-12,
    )


def test_fast_engine_first_step_matches_generic():
    """From identical states, the fast and generic engines must emit
    identical training examples (values are RNG-independent)."""
    from rebel_tpu.nets.cfv_net import CFVNetSpec
    from rebel_tpu.selfplay.fast_runner import FastSelfPlayEngine
    from rebel_tpu.selfplay.runner import (
        EpisodeState,
        RecursiveSolvingParams,
        SelfPlayEngine,
    )

    for use_cfr in (True, False):
        cfg = RecursiveSolvingParams(
            num_dice=1,
            num_faces=3,
            subgame_params=SubgameSolvingParams(
                num_iters=12, max_depth=2, linear_update=True,
                use_cfr=use_cfr,
            ),
            random_action_prob=0.25,
            sample_leaf=True,
        )
        game = cfg.game
        spec = CFVNetSpec(game=game, n_hidden=16, n_layers=1)
        vf = spec.value_fn(spec.init_params(jax.random.PRNGKey(0)))
        gen = SelfPlayEngine(cfg=cfg, dtype=DT)
        fast = FastSelfPlayEngine(cfg=cfg, dtype=DT)
        B = 3
        eps = EpisodeState.initial_batch(game, B, DT)
        keys = jax.random.split(jax.random.PRNGKey(5), B)
        _, out_g = jax.jit(lambda e, k: gen.batch_step(e, k, vf))(eps, keys)
        _, out_f = jax.jit(lambda e, k: fast.batch_step(e, k, vf))(eps, keys)
        np.testing.assert_allclose(
            np.asarray(out_f.values), np.asarray(out_g.values), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(out_f.queries), np.asarray(out_g.queries), atol=1e-12
        )


def test_fast_engine_runs_episodes():
    from rebel_tpu.nets.value_nets import zero_value_fn
    from rebel_tpu.selfplay.fast_runner import FastSelfPlayEngine
    from rebel_tpu.selfplay.runner import (
        EpisodeState,
        RecursiveSolvingParams,
    )

    cfg = RecursiveSolvingParams(
        num_dice=1,
        num_faces=3,
        subgame_params=SubgameSolvingParams(
            num_iters=32, max_depth=2, linear_update=True, use_cfr=True
        ),
        random_action_prob=0.25,
        sample_leaf=True,
    )
    game = cfg.game
    engine = FastSelfPlayEngine(cfg=cfg, dtype=DT)
    vf = zero_value_fn(game)
    B = 8
    eps = EpisodeState.initial_batch(game, B, DT)
    key = jax.random.PRNGKey(0)
    step = jax.jit(lambda e, k: engine.batch_step(e, k, vf))
    ended_any = False
    for _ in range(10):
        key, sub = jax.random.split(key)
        eps, out = step(eps, jax.random.split(sub, B))
        ended_any |= bool(np.asarray(out.ended).any())
        b = np.asarray(eps.beliefs)
        np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-9)
        assert np.all(np.asarray(eps.root_bid) < game.liar_call)
    assert ended_any


def test_grid2_compact_queries_matches_dense():
    game = LiarsDice(num_dice=1, num_faces=4)
    params = SubgameSolvingParams(
        num_iters=16, max_depth=2, linear_update=True, use_cfr=True
    )
    spec = CFVNetSpec(game=game, n_hidden=24, n_layers=1,
                      compute_dtype=jnp.float64)
    vf = spec.value_fn(spec.init_params(jax.random.PRNGKey(1)))
    dense = Grid2Solver(game=game, params=params, dtype=DT, value_fn=vf)
    compact = Grid2Solver(game=game, params=params, dtype=DT, value_fn=vf,
                          compact_queries=True)
    root = RootCtx.of(game, 2, 1)
    beliefs = jnp.full((2, game.num_hands), 1.0 / game.num_hands)
    sd = jax.jit(dense.multistep)(dense.init(root, beliefs), root)
    sc = jax.jit(compact.multistep)(compact.init(root, beliefs), root)
    np.testing.assert_allclose(
        np.asarray(sc.root_values_means), np.asarray(sd.root_values_means),
        atol=1e-12,
    )
