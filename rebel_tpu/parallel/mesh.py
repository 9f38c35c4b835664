"""Multi-chip SPMD training over a ``jax.sharding.Mesh``.

The reference scales by OS threads within a host and fully independent
Slurm ranks across hosts (no gradient sync anywhere —
/root/reference/cfvpy/selfplay.py:58-72, heyhi/__init__.py:361-406; each
rank even keeps its own replay buffer).  The TPU-native design is a
single SPMD program over a ``data`` mesh axis:

* self-play lanes are sharded over ``data`` — each device advances its
  own lanes with its own RNG (replacing per-rank seeds,
  selfplay.py:224,250);
* each device keeps a *local* replay ring fed by its local lanes (the
  honest analog of the reference's per-rank buffers, now inside one
  program);
* the learner samples a local sub-batch per device and all-reduces
  gradients over ICI (``psum``) — an intentional upgrade over the
  reference's unsynced ranks (SURVEY §2.4);
* params/opt state are replicated (the CFV MLP is tiny; no TP needed).

Everything is expressed with ``shard_map`` so collectives are explicit
and the same code runs on 1 chip, 1 host, or a multi-host slice.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rebel_tpu.selfplay import replay as rb
from rebel_tpu.selfplay.runner import EpisodeState


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh2(
    n_data: int,
    n_hands: int,
    axes: tuple[str, str] = ("data", "h"),
) -> Mesh:
    """2D mesh for combined data x hands sharding: lanes over ``data``,
    the solver's hands dimension over ``axes[1]`` (SURVEY §5's
    long-context analog — num_hands = faces^dice is the exponential
    axis)."""
    devs = np.asarray(jax.devices()[: n_data * n_hands])
    return Mesh(devs.reshape(n_data, n_hands), axes)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a batch-leading pytree sharded over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), tree
    )


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


class SpmdState(NamedTuple):
    params: Any  # replicated
    opt_state: Any  # replicated
    episodes: EpisodeState  # [B] sharded over data
    replay: rb.Replay  # rows sharded over data (local ring per device)
    keys: jax.Array  # [n_dev, 2] one PRNG key per device


def gather_to_host(mesh: Mesh, tree):
    """Host (numpy) copy of a (possibly sharded) global pytree: reshard
    to fully-replicated on device (one all-gather over the mesh), then
    read the local replica. Works identically on single-process
    multi-device meshes and jax.distributed multi-process runtimes —
    the collective is inside jit, so every process must call this."""
    sharding = NamedSharding(mesh, P())
    gathered = jax.jit(lambda t: t, out_shardings=sharding)(tree)
    return jax.tree.map(
        lambda x: np.asarray(x.addressable_data(0)), gathered
    )


def ring_valid_rows(
    replay_host, n_dev: int
) -> tuple[np.ndarray, np.ndarray]:
    """Valid (queries, values) rows of a host copy of the SPMD replay —
    n_dev device-local rings stored as row segments of one global array,
    each with its own head/size — ordered oldest-first within each
    segment (the multi-ring analog of replay.extract)."""
    local_cap = replay_host.queries.shape[0] // n_dev
    qs, vs = [], []
    for d in range(n_dev):
        size = int(replay_host.size[d])
        head = int(replay_host.head[d])
        order = d * local_cap + (head - size + np.arange(size)) % local_cap
        qs.append(replay_host.queries[order])
        vs.append(replay_host.values[order])
    return np.concatenate(qs), np.concatenate(vs)


def rows_to_ring(
    base, rows_q: np.ndarray, rows_v: np.ndarray, n_dev: int
):
    """Distribute preloaded dataset rows round-robin across the n_dev
    device-local rings of an (empty) SPMD replay host structure — the
    multi-ring analog of replay.load_into (prioritized_replay.h:329-335)."""
    local_cap = base.queries.shape[0] // n_dev
    q = np.asarray(base.queries).copy()
    v = np.asarray(base.values).copy()
    p = np.asarray(base.priorities).copy()
    head = np.zeros((n_dev,), np.int32)
    size = np.zeros((n_dev,), np.int32)
    num_add = np.zeros((n_dev,), np.int32)
    for d in range(n_dev):
        rq, rv = rows_q[d::n_dev], rows_v[d::n_dev]
        n = len(rq)
        keep = min(n, local_cap)
        rq, rv = rq[-keep:], rv[-keep:]
        q[d * local_cap : d * local_cap + keep] = rq
        v[d * local_cap : d * local_cap + keep] = rv
        p[d * local_cap : d * local_cap + keep] = 1.0
        head[d] = keep % local_cap
        size[d] = keep
        num_add[d] = n
    return base._replace(
        queries=q, values=v, priorities=p,
        head=head, size=size, num_add=num_add,
    )


def make_spmd_programs(
    trainer, mesh: Mesh, axis: str = "data", hands_axis: str | None = None
):
    """Build (init_fn, train_epoch_fn) shard_map'd over ``mesh``.

    ``trainer`` is a :class:`rebel_tpu.training.trainer.Trainer`; its cfg
    sizes are GLOBAL (lanes and batch are divided across the ``axis``
    dimension of the mesh).

    With ``hands_axis`` set (a 2D mesh from :func:`make_mesh2`), each
    data shard's subgame solves are additionally sharded over the hands
    dimension: episode state, replay rows and net params are replicated
    along ``hands_axis`` (kept identical by identical RNG keys), while
    the solver's ``[H]``-sized tensors are split, with per-iteration
    bucket psums inside the solve and one policy/value all-gather per
    subgame (see ``FastSelfPlayEngine.hands_axis``).
    """
    import dataclasses as _dc

    cfg = trainer.cfg
    game = trainer.game
    engine = trainer.engine
    if hands_axis:
        if not hasattr(engine, "hands_axis"):
            raise ValueError(
                f"engine {type(engine).__name__} does not support hands "
                "sharding (use engine='fast')"
            )
        engine = _dc.replace(engine, hands_axis=hands_axis)
        n_h = mesh.shape[hands_axis]
        assert game.num_hands % n_h == 0, (
            f"hands-axis size {n_h} must divide "
            f"num_hands={game.num_hands}"
        )
    net_spec = trainer.net_spec
    opt = trainer.opt
    n_dev = mesh.shape[axis]
    assert cfg.selfplay_batch % n_dev == 0, "lanes must divide devices"
    assert cfg.train_batch_size % n_dev == 0, "batch must divide devices"
    local_lanes = cfg.selfplay_batch // n_dev
    local_batch = cfg.train_batch_size // n_dev
    local_capacity = max(cfg.replay_capacity // n_dev, 4 * local_batch)

    def init_state(seed: int = 0) -> SpmdState:
        key = jax.random.PRNGKey(seed)
        k_net, k_dev = jax.random.split(key)
        params = replicate(mesh, trainer.net_spec.init_params(k_net))
        opt_state = replicate(mesh, opt.init(params))
        episodes = shard_batch(
            mesh,
            EpisodeState.initial_batch(
                game, cfg.selfplay_batch, cfg.solver_dtype
            ),
        )
        # Global replay with n_dev * local_capacity rows, sharded by row;
        # head/size/num_add are per-device vectors (one local ring each).
        base = rb.create(
            n_dev * local_capacity, game.query_size, game.num_hands
        )
        replay = shard_batch(
            mesh,
            base._replace(
                head=jnp.zeros((n_dev,), jnp.int32),
                size=jnp.zeros((n_dev,), jnp.int32),
                num_add=jnp.zeros((n_dev,), jnp.int32),
            ),
        )
        keys = shard_batch(mesh, jax.random.split(k_dev, n_dev))
        return SpmdState(params, opt_state, episodes, replay, keys)

    replay_specs = rb.Replay(
        queries=P(axis), values=P(axis), priorities=P(axis),
        head=P(axis), size=P(axis), num_add=P(axis),
    )

    def _local_replay(replay):
        return replay._replace(
            head=replay.head[0], size=replay.size[0], num_add=replay.num_add[0]
        )

    def _global_replay(replay):
        return replay._replace(
            head=replay.head[None], size=replay.size[None],
            num_add=replay.num_add[None],
        )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), EpisodeState(P(axis), P(axis), P(axis)), replay_specs,
                  P(axis)),
        out_specs=(EpisodeState(P(axis), P(axis), P(axis)), replay_specs,
                   P(axis)),
        check_vma=False,
    )
    def gen_step(params, episodes, replay, keys):
        """One lockstep engine step on this device's lanes; examples go
        to the device-local ring."""
        replay = _local_replay(replay)
        key, k = jax.random.split(keys[0])
        net_arg = (
            params
            if getattr(engine, "wants_params", False)
            else net_spec.value_fn(params)
        )
        lane_keys = jax.random.split(k, local_lanes)
        episodes, out = engine.batch_step(episodes, lane_keys, net_arg)
        q = out.queries.reshape(-1, game.query_size)
        v = out.values.reshape(-1, game.num_hands)
        replay = rb.add(replay, q, v, 1.0, cfg.replay_alpha)
        return episodes, _global_replay(replay), key[None]

    def _loss(params, queries, targets):
        from rebel_tpu.training.trainer import huber

        pred = net_spec.module.apply(params, queries)
        err = targets - pred
        per_ex = (huber(err) if cfg.loss == "huber" else err * err).mean(-1)
        return per_ex.mean(), per_ex

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), replay_specs, P(axis)),
        out_specs=(P(), P(), P(axis), P()),
        check_vma=False,
    )
    def train_step(params, opt_state, replay, keys):
        """Local sub-batch per device; grads psum'd over the mesh so the
        replicated params stay identical (the reference's DataParallel
        analog, selfplay.py:84-87, upgraded to cross-host).  Returns the
        same per-last-action stats dict as the single-process step
        (selfplay.py:158-170,449-458): bucket sums psum'd over the mesh,
        so metric names/semantics match across paths."""
        from rebel_tpu.training.trainer import last_action_index

        replay = _local_replay(replay)
        key, k = jax.random.split(keys[0])
        sample = rb.sample_uniform(replay, k, local_batch)
        (loss, per_ex), grads = jax.value_and_grad(_loss, has_aux=True)(
            params, sample.queries, sample.values
        )
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        g_norm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        bucket = last_action_index(sample.queries, game.num_actions)
        nb = game.num_actions + 1
        stats = dict(
            loss=loss,
            g_norm=g_norm,
            counts=jax.lax.psum(
                jnp.zeros(nb).at[bucket].add(1.0), axis),
            loss_sums=jax.lax.psum(
                jnp.zeros(nb).at[bucket].add(per_ex), axis),
            val_sums=jax.lax.psum(
                jnp.zeros(nb).at[bucket].add(sample.values.sum(-1)), axis),
        )
        return params, opt_state, key[None], stats

    # Donate the episode/replay/key buffers through gen_step: without
    # aliasing, every call copies the whole replay ring (2x peak HBM and
    # a full-buffer memcpy per gen step).  Params are NOT donated — the
    # caller keeps using them.
    return (
        init_state,
        jax.jit(gen_step, donate_argnums=(1, 2, 3)),
        jax.jit(train_step),
    )
