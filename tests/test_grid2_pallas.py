"""The fused Pallas kernel must match the batch-last solver exactly
(run in interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rebel_tpu import LiarsDice
from rebel_tpu.nets.cfv_net import CFVNetSpec
from rebel_tpu.solving.grid2b import Grid2BatchSolver, RootCtxB
from rebel_tpu.solving.grid2p import Grid2PallasSolver
from rebel_tpu.solving.params import SubgameSolvingParams


@pytest.mark.parametrize("use_cfr", [True, False])
def test_pallas_kernel_matches_grid2b(use_cfr):
    game = LiarsDice(num_dice=1, num_faces=4)
    params = SubgameSolvingParams(
        num_iters=10, max_depth=2, linear_update=True, use_cfr=use_cfr
    )
    spec = CFVNetSpec(game=game, n_hidden=16, n_layers=2)
    net_params = spec.init_params(jax.random.PRNGKey(2))

    B = 8
    rng = np.random.RandomState(4)
    bids = np.array([-1, 0, 2, 5, -1, 3, 6, game.num_actions - 2], np.int32)
    players = np.array([0, 1, 0, 1, 1, 0, 1, 0], np.int32)
    beliefs = rng.dirichlet(np.ones(game.num_hands), size=(B, 2)).astype(
        np.float32
    )
    t_stop = np.array([0, 3, 10, 7, 5, 1, 9, 2], np.int32)

    # Reference: batch-last solver with explicit snapshot scan.
    ref = Grid2BatchSolver(
        game=game, params=params, dtype=jnp.float32, net_params=net_params
    )
    root = RootCtxB.of(game, bids, players)
    belb = jnp.asarray(np.moveaxis(beliefs, 0, -1))
    state = ref.init(root, belb)
    snap = ref.sampling_strategy(state, root)
    tj = jnp.asarray(t_stop)

    def body(carry, it):
        st, sn = carry
        cur = ref.sampling_strategy(st, root)
        sn = jax.tree.map(lambda c, s: jnp.where(it == tj, c, s), cur, sn)
        st = ref.step(st, it % 2, root)
        return (st, sn), None

    (state, (s0, s1)), _ = jax.lax.scan(
        body, (state, snap), jnp.arange(params.num_iters)
    )
    f0, f1 = ref.sampling_strategy(state, root)
    s0 = jnp.where(tj == params.num_iters, f0, s0)
    s1 = jnp.where(tj == params.num_iters, f1, s1)

    # Pallas (interpret mode, lane_block = B).
    solver = Grid2PallasSolver(
        game=game, params=params, lane_block=B, interpret=True
    )
    out = solver.solve(bids, players, beliefs, t_stop, net_params)

    np.testing.assert_allclose(
        np.asarray(out.rvm),
        np.moveaxis(np.asarray(state.root_values_means), -1, 0),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.snap0), np.moveaxis(np.asarray(s0), -1, 0), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.snap1), np.moveaxis(np.asarray(s1), -1, 0), atol=1e-5
    )


def test_pallas_engine_matches_fast_engine():
    from rebel_tpu.nets.cfv_net import CFVNetSpec
    from rebel_tpu.selfplay.fast_runner import (
        FastPallasEngine,
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
            num_iters=8, max_depth=2, linear_update=True, use_cfr=True
        ),
        random_action_prob=0.25,
        sample_leaf=True,
    )
    game = cfg.game
    spec = CFVNetSpec(game=game, n_hidden=16, n_layers=1)
    net_params = spec.init_params(jax.random.PRNGKey(0))
    vf = spec.value_fn(net_params)
    B = 4
    eps = EpisodeState.initial_batch(game, B, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    fast = FastSelfPlayEngine(cfg=cfg, dtype=jnp.float32)
    _, out_f = jax.jit(lambda e, k: fast.batch_step(e, k, vf))(eps, keys)
    pl_eng = FastPallasEngine(
        cfg=cfg, dtype=jnp.float32, lane_block=B, interpret=True
    )
    _, out_p = pl_eng.batch_step(eps, keys, net_params)
    np.testing.assert_allclose(
        np.asarray(out_p.values), np.asarray(out_f.values), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_p.queries), np.asarray(out_f.queries), atol=1e-6
    )


def test_pallas_interleave_matches_single_block():
    """interleave=2 (software-pipelined half-blocks) must match
    interleave=1 to f32 ulp noise: per-lane math is identical, but the
    MLP gemm's accumulation blocking varies with the column count
    (P*LB vs P*LB/2), so single-ulp differences are expected."""
    game = LiarsDice(num_dice=1, num_faces=4)
    params = SubgameSolvingParams(
        num_iters=9, max_depth=2, linear_update=True, use_cfr=True
    )
    spec = CFVNetSpec(game=game, n_hidden=16, n_layers=2)
    net_params = spec.init_params(jax.random.PRNGKey(2))

    B = 8
    rng = np.random.RandomState(7)
    bids = np.array([-1, 0, 2, 5, -1, 3, 6, game.num_actions - 2], np.int32)
    players = np.array([0, 1, 0, 1, 1, 0, 1, 0], np.int32)
    beliefs = rng.dirichlet(np.ones(game.num_hands), size=(B, 2)).astype(
        np.float32
    )
    t_stop = np.array([0, 3, 9, 7, 5, 1, 8, 2], np.int32)

    base = Grid2PallasSolver(
        game=game, params=params, lane_block=B, interpret=True
    ).solve(bids, players, beliefs, t_stop, net_params)
    inter = Grid2PallasSolver(
        game=game, params=params, lane_block=B, interleave=2, interpret=True
    ).solve(bids, players, beliefs, t_stop, net_params)

    for a, b in zip(base, inter):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=1e-5
        )


def test_pallas_kernel_handles_layer_norm_free_nets():
    """CFVNet(use_layer_norm=False) produces 2 leaves per hidden layer
    instead of 4; the kernel's param unflattening must follow the
    actual layout (it used to assume 4 and misparse LN-less nets)."""
    game = LiarsDice(num_dice=1, num_faces=4)
    params = SubgameSolvingParams(
        num_iters=6, max_depth=2, linear_update=True, use_cfr=True
    )
    spec = CFVNetSpec(
        game=game, n_hidden=16, n_layers=2, use_layer_norm=False
    )
    net_params = spec.init_params(jax.random.PRNGKey(3))

    B = 4
    rng = np.random.RandomState(5)
    bids = np.array([-1, 0, 3, 6], np.int32)
    players = np.array([0, 1, 1, 0], np.int32)
    beliefs = rng.dirichlet(np.ones(game.num_hands), size=(B, 2)).astype(
        np.float32
    )
    t_stop = np.array([0, 2, 6, 4], np.int32)

    ref = Grid2BatchSolver(
        game=game, params=params, dtype=jnp.float32, net_params=net_params
    )
    root = RootCtxB.of(game, bids, players)
    belb = jnp.asarray(np.moveaxis(beliefs, 0, -1))
    state = ref.init(root, belb)
    snap = ref.sampling_strategy(state, root)
    tj = jnp.asarray(t_stop)

    def body(carry, it):
        st, sn = carry
        cur = ref.sampling_strategy(st, root)
        sn = jax.tree.map(lambda c, s: jnp.where(it == tj, c, s), cur, sn)
        st = ref.step(st, it % 2, root)
        return (st, sn), None

    (state, (s0, s1)), _ = jax.lax.scan(
        body, (state, snap), jnp.arange(params.num_iters)
    )
    f0, f1 = ref.sampling_strategy(state, root)
    s0 = jnp.where(tj == params.num_iters, f0, s0)
    s1 = jnp.where(tj == params.num_iters, f1, s1)

    out = Grid2PallasSolver(
        game=game, params=params, lane_block=B, gelu="exact",
        interpret=True,
    ).solve(bids, players, beliefs, t_stop, net_params)
    np.testing.assert_allclose(
        np.asarray(out.rvm),
        np.moveaxis(np.asarray(state.root_values_means), -1, 0),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.snap0), np.moveaxis(np.asarray(s0), -1, 0), atol=1e-5
    )


@pytest.mark.parametrize(
    "variant",
    [
        dict(use_cfr=True, linear_update=False, dcfr=True,
             dcfr_alpha=1.5, dcfr_beta=0.5, dcfr_gamma=2.0),
        dict(use_cfr=False, linear_update=True, optimistic=True),
    ],
    ids=["dcfr", "optimistic_fp"],
)
def test_pallas_variants_match_grid2b(variant):
    """DCFR discounting and optimistic FP through the fused kernel must
    match the batch-last engine (the linear paths are covered above;
    these close the solver-variant coverage matrix)."""
    game = LiarsDice(num_dice=1, num_faces=4)
    params = SubgameSolvingParams(num_iters=8, max_depth=2, **variant)
    spec = CFVNetSpec(game=game, n_hidden=16, n_layers=2)
    net_params = spec.init_params(jax.random.PRNGKey(2))

    B = 4
    rng = np.random.RandomState(9)
    bids = np.array([-1, 0, 3, 6], np.int32)
    players = np.array([0, 1, 1, 0], np.int32)
    beliefs = rng.dirichlet(np.ones(game.num_hands), size=(B, 2)).astype(
        np.float32
    )
    t_stop = np.array([0, 3, 8, 5], np.int32)

    ref = Grid2BatchSolver(
        game=game, params=params, dtype=jnp.float32, net_params=net_params
    )
    root = RootCtxB.of(game, bids, players)
    belb = jnp.asarray(np.moveaxis(beliefs, 0, -1))
    state = ref.init(root, belb)
    snap = ref.sampling_strategy(state, root)
    tj = jnp.asarray(t_stop)

    def body(carry, it):
        st, sn = carry
        cur = ref.sampling_strategy(st, root)
        sn = jax.tree.map(lambda c, s: jnp.where(it == tj, c, s), cur, sn)
        st = ref.step(st, it % 2, root)
        return (st, sn), None

    (state, (s0, s1)), _ = jax.lax.scan(
        body, (state, snap), jnp.arange(params.num_iters)
    )
    f0, f1 = ref.sampling_strategy(state, root)
    s0 = jnp.where(tj == params.num_iters, f0, s0)
    s1 = jnp.where(tj == params.num_iters, f1, s1)

    out = Grid2PallasSolver(
        game=game, params=params, lane_block=B, gelu="exact",
        interpret=True,
    ).solve(bids, players, beliefs, t_stop, net_params)
    np.testing.assert_allclose(
        np.asarray(out.rvm),
        np.moveaxis(np.asarray(state.root_values_means), -1, 0),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.snap0), np.moveaxis(np.asarray(s0), -1, 0),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out.snap1), np.moveaxis(np.asarray(s1), -1, 0),
        atol=1e-5,
    )
