"""Hands-dimension sharding: the solver's exponential scaling axis
(num_hands = faces^dice — SURVEY §5's sequence-parallelism analog)
sharded over a mesh must reproduce the single-device solve exactly."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from rebel_tpu import LiarsDice
from rebel_tpu.nets.cfv_net import CFVNetSpec
from rebel_tpu.solving.core import RootCtx
from rebel_tpu.solving.grid2 import Grid2Solver, Grid2State
from rebel_tpu.solving.params import SubgameSolvingParams

DT = jnp.float64


def state_specs():
    return Grid2State(
        regrets0=P("h", None),
        sum0=P("h", None),
        last0=P("h", None),
        regrets1=P(None, "h", None),
        sum1=P(None, "h", None),
        last1=P(None, "h", None),
        root_values_means=P(None, "h"),
        num_steps=P(),
        beliefs=P(None, "h"),
    )


def test_hands_sharded_solve_matches_unsharded():
    game = LiarsDice(num_dice=2, num_faces=3)  # H = 9, sharded 3-way
    params = SubgameSolvingParams(
        num_iters=16, max_depth=2, linear_update=True, use_cfr=True
    )
    spec = CFVNetSpec(game=game, n_hidden=16, n_layers=1)
    value_fn = spec.value_fn(spec.init_params(jax.random.PRNGKey(0)))

    plain = Grid2Solver(game=game, params=params, dtype=DT, value_fn=value_fn)
    sharded = Grid2Solver(
        game=game, params=params, dtype=DT, value_fn=value_fn,
        hands_axis="h",
    )

    rng = np.random.RandomState(3)
    beliefs = jnp.asarray(rng.dirichlet(np.ones(game.num_hands), size=2))
    root = RootCtx.of(game, 2, 1)

    state0 = plain.init(root, beliefs)
    expect = jax.jit(plain.multistep)(state0, root)

    mesh = Mesh(np.asarray(jax.devices()[:3]), ("h",))
    root_specs = RootCtx(bid=P(), player=P(), mask=P())
    run = jax.jit(
        jax.shard_map(
            lambda st, rt: sharded.multistep(st, rt),
            mesh=mesh,
            in_specs=(state_specs(), root_specs),
            out_specs=state_specs(),
            check_vma=False,
        )
    )
    got = run(state0, root)

    np.testing.assert_allclose(
        np.asarray(got.root_values_means),
        np.asarray(expect.root_values_means),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(got.sum1), np.asarray(expect.sum1), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(got.last0), np.asarray(expect.last0), atol=1e-12
    )


def test_hands_sharded_engine_matches_unsharded():
    """Engine-level: the full solve->walk gen step with the solve
    sharded 3-way over hands reproduces the unsharded engine exactly
    (policies/values gathered once per subgame)."""
    from rebel_tpu.selfplay.fast_runner import FastSelfPlayEngine
    from rebel_tpu.selfplay.runner import (
        EpisodeState,
        RecursiveSolvingParams,
    )

    cfg = RecursiveSolvingParams(
        num_dice=2,
        num_faces=3,
        subgame_params=SubgameSolvingParams(
            num_iters=12, max_depth=2, linear_update=True, use_cfr=True
        ),
        random_action_prob=0.25,
        sample_leaf=True,
    )
    game = cfg.game
    spec = CFVNetSpec(game=game, n_hidden=16, n_layers=1)
    value_fn = spec.value_fn(spec.init_params(jax.random.PRNGKey(0)))

    B = 4
    plain = FastSelfPlayEngine(cfg=cfg, dtype=DT)
    sharded = FastSelfPlayEngine(cfg=cfg, dtype=DT, hands_axis="h")
    eps = EpisodeState.initial_batch(game, B, DT)
    keys = jax.random.split(jax.random.PRNGKey(7), B)

    eps_p, out_p = jax.jit(
        lambda e, k: plain.batch_step(e, k, value_fn)
    )(eps, keys)

    mesh = Mesh(np.asarray(jax.devices()[:3]), ("h",))
    run = jax.jit(
        jax.shard_map(
            lambda e, k: sharded.batch_step(e, k, value_fn),
            mesh=mesh,
            # Episode state and keys replicated; hands split inside.
            in_specs=(P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    eps_s, out_s = run(eps, keys)

    np.testing.assert_allclose(
        np.asarray(out_s.queries), np.asarray(out_p.queries), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out_s.values), np.asarray(out_p.values), atol=1e-12
    )
    np.testing.assert_array_equal(
        np.asarray(out_s.ended), np.asarray(out_p.ended)
    )
    for leaf_s, leaf_p in zip(
        jax.tree.leaves(eps_s), jax.tree.leaves(eps_p)
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_s), np.asarray(leaf_p), atol=1e-12
        )


def test_hands_by_data_spmd_gen_train():
    """Combined data x hands sharding: gen + train SPMD programs on a
    (data=2, h=3) mesh run and learn on 2x3f (VERDICT: hands sharding
    beyond a single solver engine)."""
    import jax.numpy as jnp

    from rebel_tpu.parallel.mesh import make_mesh2, make_spmd_programs
    from rebel_tpu.selfplay.runner import RecursiveSolvingParams
    from rebel_tpu.training.trainer import Trainer, TrainerConfig

    cfg = TrainerConfig(
        env=RecursiveSolvingParams(
            num_dice=2,
            num_faces=3,
            subgame_params=SubgameSolvingParams(
                num_iters=8, max_depth=2, linear_update=True, use_cfr=True
            ),
            random_action_prob=0.25,
            sample_leaf=True,
        ),
        n_hidden=16,
        n_layers=1,
        engine="fast",
        selfplay_batch=8,
        train_batch_size=8,
        train_epoch_size=8,
        replay_capacity=256,
        solver_dtype=jnp.float32,
    )
    trainer = Trainer(cfg)
    mesh = make_mesh2(2, 3)
    init_state, gen_step, train_step = make_spmd_programs(
        trainer, mesh, hands_axis="h"
    )
    st = init_state(seed=0)
    params, opt_state = st.params, st.opt_state
    episodes, replay, keys = st.episodes, st.replay, st.keys
    for _ in range(3):
        episodes, replay, keys = gen_step(params, episodes, replay, keys)
    losses = []
    for _ in range(3):
        params, opt_state, keys, stats = train_step(
            params, opt_state, replay, keys
        )
        losses.append(float(np.asarray(stats["loss"])))
    assert np.isfinite(losses).all()
    assert int(np.asarray(replay.num_add).sum()) > 0
