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
