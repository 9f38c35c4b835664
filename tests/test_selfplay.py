"""Self-play engine + replay tests, porting the RlRunner smoke tests
(/root/reference/csrc/liars_dice/recursive_solving_test.cc:37-68) and
adding array-level invariants of the batched lockstep design."""

import jax
import jax.numpy as jnp
import numpy as np

from rebel_tpu import LiarsDice
from rebel_tpu.nets.value_nets import zero_value_fn
from rebel_tpu.selfplay import replay as rb
from rebel_tpu.selfplay.runner import (
    EpisodeState,
    RecursiveSolvingParams,
    SelfPlayEngine,
)
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.solving.queries import deserialize_query

DT = jnp.float64


def make_engine(sample_leaf, max_depth, num_iters=100, use_cfr=False):
    cfg = RecursiveSolvingParams(
        num_dice=1,
        num_faces=3,
        subgame_params=SubgameSolvingParams(
            num_iters=num_iters,
            max_depth=max_depth,
            linear_update=True,
            use_cfr=use_cfr,
        ),
        random_action_prob=0.25,
        sample_leaf=sample_leaf,
    )
    return SelfPlayEngine(cfg=cfg, dtype=DT)


def run_steps(engine, steps, batch=4, seed=0):
    game = engine.game
    value_fn = zero_value_fn(game)
    eps = EpisodeState.initial_batch(game, batch, DT)
    key = jax.random.PRNGKey(seed)
    step = jax.jit(lambda e, k: engine.batch_step(e, k, value_fn))
    outs = []
    for i in range(steps):
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, batch)
        eps, out = step(eps, keys)
        outs.append(out)
    return eps, outs


def test_zero_net_single_step_mode():
    # recursive_solving_test.cc:37-51 (sample_leaf=False, max_depth=1).
    engine = make_engine(sample_leaf=False, max_depth=1)
    eps, outs = run_steps(engine, steps=10)
    # States stay within the game's public state space.
    assert np.all(np.asarray(eps.root_bid) >= -1)
    assert np.all(np.asarray(eps.root_bid) < engine.game.liar_call)
    b = np.asarray(eps.beliefs)
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-9)


def test_zero_net_sample_leaf_mode():
    # recursive_solving_test.cc:53-68 (sample_leaf=True, max_depth=2).
    engine = make_engine(sample_leaf=True, max_depth=2)
    eps, outs = run_steps(engine, steps=10)
    assert np.all(np.asarray(eps.root_bid) >= -1)
    assert np.all(np.asarray(eps.root_bid) < engine.game.liar_call)
    # Some episodes should have ended over 10 steps of depth-2 walks.
    ended = np.stack([np.asarray(o.ended) for o in outs])
    assert ended.any()


def test_training_example_queries_decode():
    """Emitted queries must round-trip to the lane's public state
    (subgame_solving.cc:220-226)."""
    engine = make_engine(sample_leaf=True, max_depth=2, num_iters=8)
    game = engine.game
    eps, outs = run_steps(engine, steps=1, batch=3)
    q = np.asarray(outs[0].queries)  # [B, 2, Q]
    assert q.shape == (3, 2, game.query_size)
    for lane in range(3):
        for trav in range(2):
            t2, bid2, p2, b0, b1 = deserialize_query(game, q[lane, trav])
            assert t2 == trav
            assert bid2 == -1  # first step: initial state
            assert p2 == 0
            np.testing.assert_allclose(b0, 1.0 / game.num_hands, atol=1e-9)
    v = np.asarray(outs[0].values)
    assert v.shape == (3, 2, game.num_hands)
    assert np.isfinite(v).all()


def test_cfr_engine_runs():
    engine = make_engine(sample_leaf=True, max_depth=2, use_cfr=True)
    eps, outs = run_steps(engine, steps=3, batch=2)
    assert np.isfinite(np.asarray(outs[-1].values)).all()


# ---------------------------------------------------------------- replay
def test_replay_ring_and_uniform_sampling():
    r = rb.create(capacity=8, query_size=3, num_hands=2)
    q = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    v = jnp.arange(8, dtype=jnp.float32).reshape(4, 2)
    r = rb.add(r, q, v)
    assert int(r.size) == 4 and int(r.num_add) == 4
    # Overflow wraps and keeps the newest `capacity` rows.
    q2 = 100 + jnp.arange(18, dtype=jnp.float32).reshape(6, 3)
    v2 = 100 + jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    r = rb.add(r, q2, v2)
    assert int(r.size) == 8 and int(r.num_add) == 10
    s = rb.sample_uniform(r, jax.random.PRNGKey(0), 64)
    # All sampled rows must be among the 8 newest (values >= 100 for the
    # 6 new rows, or the last 2 of the first batch).
    sampled_first_col = np.asarray(s.queries[:, 0])
    valid_first_cols = set(
        np.concatenate([np.asarray(q)[2:, 0], np.asarray(q2)[:, 0]]).tolist()
    )
    assert set(sampled_first_col.tolist()) <= valid_first_cols


def test_replay_prioritized_sampling_weights():
    r = rb.create(capacity=16, query_size=1, num_hands=1)
    q = jnp.arange(4, dtype=jnp.float32).reshape(4, 1)
    v = jnp.zeros((4, 1), jnp.float32)
    prio = jnp.asarray([1.0, 1.0, 1.0, 97.0])
    r = rb.add(r, q, v, prio, alpha=1.0)
    s = rb.sample_prioritized(r, jax.random.PRNGKey(1), 1000, beta=1.0)
    frac_heavy = float((np.asarray(s.queries[:, 0]) == 3).mean())
    assert frac_heavy > 0.9  # 97% of the mass
    # Importance weights: (N * w / sum)^-beta / max, so the heavy row has
    # the smallest weight.
    w = np.asarray(s.weights)
    heavy = np.asarray(s.queries[:, 0]) == 3
    assert w[heavy].max() < w[~heavy].min() if (~heavy).any() else True


def test_replay_save_load_roundtrip(tmp_path):
    r = rb.create(capacity=8, query_size=3, num_hands=2)
    q = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    v = jnp.arange(8, dtype=jnp.float32).reshape(4, 2)
    r = rb.add(r, q, v)
    path = str(tmp_path / "data.bin")
    n = rb.save(r, path)
    assert n == 4
    q2, v2 = rb.load_file(path)
    np.testing.assert_array_equal(q2, np.asarray(q))
    np.testing.assert_array_equal(v2, np.asarray(v))
    r2 = rb.create(capacity=8, query_size=3, num_hands=2)
    r2 = rb.load_into(r2, path)
    assert int(r2.size) == 4


def test_replay_overfill_add_keeps_newest():
    """One add() larger than capacity must retain exactly the newest
    `capacity` rows (duplicate scatter indices are order-undefined on
    TPU, so oversize adds are pre-trimmed)."""
    r = rb.create(4, 2, 2)
    q = np.arange(14, dtype=np.float32).reshape(7, 2)
    v = q.copy()
    r = rb.add(r, jnp.asarray(q), jnp.asarray(v))
    assert int(r.size) == 4
    assert int(r.num_add) == 7
    got_q, got_v = rb.extract(r)
    np.testing.assert_array_equal(got_q, q[-4:])
    np.testing.assert_array_equal(got_v, v[-4:])


def test_replay_empty_buffer_sampling_is_finite():
    r = rb.create(8, 2, 2)
    s = rb.sample_uniform(r, jax.random.PRNGKey(0), 3)
    np.testing.assert_array_equal(np.asarray(s.weights), 0.0)
    sp = rb.sample_prioritized(r, jax.random.PRNGKey(0), 3, beta=0.4)
    w = np.asarray(sp.weights)
    assert np.isfinite(w).all() and (w == 0).all()


def test_replay_empty_dump_raises(tmp_path):
    p = tmp_path / "empty.bin"
    p.write_bytes(b"")
    try:
        rb.load_file(str(p))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "no rows" in str(e)


def test_pallas_engine_nondivisible_batch():
    """lane_block falls back to gcd(lane_block, B) so any batch size
    runs (B=6 with lane_block=4 used to assert out)."""
    from rebel_tpu.nets.cfv_net import CFVNetSpec
    from rebel_tpu.selfplay.fast_runner import FastPallasEngine
    from rebel_tpu.selfplay.runner import EpisodeState

    cfg = RecursiveSolvingParams(
        num_dice=1,
        num_faces=3,
        subgame_params=SubgameSolvingParams(
            num_iters=4, max_depth=2, linear_update=True, use_cfr=True
        ),
        random_action_prob=0.25,
        sample_leaf=True,
    )
    eng = FastPallasEngine(
        cfg=cfg, dtype=jnp.float32, lane_block=4, interpret=True
    )
    spec = CFVNetSpec(game=eng.game, n_hidden=8, n_layers=1)
    params = spec.init_params(jax.random.PRNGKey(0))
    B = 6
    eps = EpisodeState.initial_batch(eng.game, B, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    _, out = eng.batch_step(eps, keys, params)
    assert np.isfinite(np.asarray(out.values)).all()
