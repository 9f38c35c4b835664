"""Batch-last solver must match the vmapped batch-first solver exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rebel_tpu import LiarsDice
from rebel_tpu.nets.cfv_net import CFVNetSpec
from rebel_tpu.solving.core import RootCtx
from rebel_tpu.solving.grid2 import Grid2Solver
from rebel_tpu.solving.grid2b import Grid2BatchSolver, RootCtxB
from rebel_tpu.solving.params import SubgameSolvingParams

DT = jnp.float64


@pytest.mark.parametrize("use_cfr", [True, False])
def test_grid2b_matches_grid2(use_cfr):
    game = LiarsDice(num_dice=1, num_faces=4)
    params = SubgameSolvingParams(
        num_iters=20, max_depth=2, linear_update=True, use_cfr=use_cfr
    )
    spec = CFVNetSpec(game=game, n_hidden=24, n_layers=2,
                      compute_dtype=jnp.float64)
    net_params = spec.init_params(jax.random.PRNGKey(7))
    value_fn = spec.value_fn(net_params)

    ref = Grid2Solver(game=game, params=params, dtype=DT, value_fn=value_fn)
    fast = Grid2BatchSolver(
        game=game, params=params, dtype=DT, net_params=net_params,
        net_compute_dtype=jnp.float64,
    )

    rng = np.random.RandomState(5)
    B = 5
    bids = np.array([-1, 0, 3, 6, game.num_actions - 2], np.int32)
    players = np.array([0, 1, 0, 1, 0], np.int32)
    beliefs = rng.dirichlet(np.ones(game.num_hands), size=(B, 2))  # [B,2,H]

    # Reference: vmapped batch-first.
    def solve_one(bid, player, bel):
        root = RootCtx.of(game, bid, player)
        st = ref.init(root, bel)
        st = ref.multistep(st, root)
        s0, s1 = ref.sampling_strategy(st, root)
        return st.root_values_means, s0, s1

    rvm_ref, s0_ref, s1_ref = jax.jit(jax.vmap(solve_one))(
        jnp.asarray(bids), jnp.asarray(players), jnp.asarray(beliefs)
    )

    # Batch-last.
    rootb = RootCtxB.of(game, bids, players)
    belb = jnp.asarray(np.moveaxis(beliefs, 0, -1))  # [2, H, B]
    st = fast.init(rootb, belb)
    st = jax.jit(fast.multistep)(st, rootb)
    s0b, s1b = fast.sampling_strategy(st, rootb)

    np.testing.assert_allclose(
        np.moveaxis(np.asarray(st.root_values_means), -1, 0),
        np.asarray(rvm_ref),
        atol=1e-12,
    )
    # Strategies compared on valid entries only.
    for b in range(B):
        root = RootCtx.of(game, bids[b], players[b])
        m0 = np.asarray(root.mask)
        m1e = np.asarray(fast.m1)[:, :] & m0[:, None]
        got0 = np.asarray(s0b)[..., b]
        np.testing.assert_allclose(
            got0[:, m0], np.asarray(s0_ref)[b][:, m0], atol=1e-12
        )
        got1 = np.moveaxis(np.asarray(s1b)[..., b], 1, 2)  # [A1, A2, H]
        ref1 = np.moveaxis(np.asarray(s1_ref)[b], 1, 2)
        np.testing.assert_allclose(
            got1[m1e], ref1[m1e], atol=1e-12
        )


def test_batched_engine_matches_fast_engine():
    """Values/queries (RNG-independent) from the batch-last engine must
    equal the batch-first fast engine's."""
    from rebel_tpu.selfplay.fast_runner import (
        FastBatchedEngine,
        FastSelfPlayEngine,
    )
    from rebel_tpu.selfplay.runner import (
        EpisodeState,
        RecursiveSolvingParams,
    )

    cfg = RecursiveSolvingParams(
        num_dice=1,
        num_faces=3,
        subgame_params=SubgameSolvingParams(
            num_iters=12, max_depth=2, linear_update=True, use_cfr=True
        ),
        random_action_prob=0.25,
        sample_leaf=True,
    )
    game = cfg.game
    spec = CFVNetSpec(game=game, n_hidden=16, n_layers=1,
                      compute_dtype=jnp.float64)
    net_params = spec.init_params(jax.random.PRNGKey(0))
    vf = spec.value_fn(net_params)

    B = 4
    eps = EpisodeState.initial_batch(game, B, DT)
    keys = jax.random.split(jax.random.PRNGKey(9), B)

    fast = FastSelfPlayEngine(cfg=cfg, dtype=DT)
    _, out_f = jax.jit(lambda e, k: fast.batch_step(e, k, vf))(eps, keys)

    batched = FastBatchedEngine(cfg=cfg, dtype=DT,
                                net_compute_dtype=jnp.float64)
    _, out_b = jax.jit(
        lambda e, k: batched.batch_step(e, k, net_params)
    )(eps, keys)

    np.testing.assert_allclose(
        np.asarray(out_b.values), np.asarray(out_f.values), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_b.queries), np.asarray(out_f.queries), atol=1e-12
    )
