"""Fused actor-learner self-play trainer.

Re-design of the reference trainer (/root/reference/cfvpy/selfplay.py):
the reference splits work across C++ actor threads (generation), a
TorchScript model pool (inference) and a Python GPU loop (SGD), syncing
weights through ``ModelLocker::updateModel``.  Here generation and
training are two jit'd device programs sharing one set of live params —
actors always use the learner's current weights, so
``network_sync_epochs`` is satisfied for free — and the replay buffer
never leaves the device.

Kept semantics (with reference evidence):

* custom huber loss ``|x|>1 ? 2|x|-1 : x^2``, mean over hands then batch
  (cfvpy/selfplay.py:135-152);
* Adam lr 3e-4, grad-norm clip 5.0, halve lr every
  ``decrease_lr_every`` epochs at most ``decrease_lr_times`` times
  (conf/c02_selfplay/liars_sp.yaml:2-6, selfplay.py:341-351);
* epoch = ``train_epoch_size / train_batch_size`` batches
  (selfplay.py:295-300);
* train/gen throttle: train only while
  ``replay.num_add * train_gen_ratio >= train_size * (epoch + 1)``
  (selfplay.py:391-405);
* per-last-action loss buckets (selfplay.py:158-170, 449-458) and the
  reference's metric names;
* every 10 epochs: checkpoint; every 20: exploitability eval
  (selfplay.py:523-570).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import pathlib
import pickle
import time
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rebel_tpu.games.liars_dice import LiarsDice
from rebel_tpu.nets.cfv_net import CFVNetSpec
from rebel_tpu.selfplay import replay as rb
from rebel_tpu.selfplay.fast_runner import make_engine
from rebel_tpu.selfplay.runner import EpisodeState, RecursiveSolvingParams

log = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    env: RecursiveSolvingParams = RecursiveSolvingParams()
    # Model (conf/c02_selfplay/liars_sp.yaml:28-33).
    n_hidden: int = 256
    n_layers: int = 2
    use_layer_norm: bool = True
    # Optimizer (conf/common/optimizer/adam.yaml, liars_sp.yaml:2-6).
    lr: float = 3e-4
    decrease_lr_every: int = 400
    decrease_lr_times: int = 2
    grad_clip: float = 5.0
    loss: str = "huber"
    # Optimizer family (conf/common/optimizer/{adam,sgd,radam,ralamb}.yaml):
    # 'adam' | 'sgd' | 'radam' | 'ralamb' (RAdam + layer-wise trust ratio).
    optimizer: str = "adam"
    momentum: float = 0.9  # sgd only (conf/common/optimizer/sgd.yaml)
    # Data (liars_sp.yaml:35-43).
    train_epoch_size: int = 25600
    train_batch_size: int = 512
    replay_capacity: int = 2_000_000
    replay_alpha: float = 1.0
    replay_beta: float = 1.0
    use_priority: bool = False
    train_gen_ratio: int = 4
    max_epochs: int = 10000
    # Self-play engine: 'auto' | 'generic' | 'fast' | 'batched' | 'pallas'.
    engine: str = "auto"
    # MLP matmul dtype inside the gen engine ('batched'/'pallas' only):
    # bfloat16 rides the MXU natively (the fused kernel's fast-GELU path,
    # see results/KERNEL_TUNING.md); float32 is the parity path.
    net_compute_dtype: Any = jnp.float32
    selfplay_batch: int = 1024  # lockstep lanes (replaces thread count)
    gen_chunk_steps: int = 1  # engine steps per jit'd gen call
    seed: int = 0
    # Eval/checkpoint cadence (selfplay.py:523-555).
    checkpoint_every: int = 10
    # Full-state checkpoints retained (params-only exports are kept
    # forever; full-state ones embed the replay buffer and are large).
    keep_checkpoints: int = 3
    # Abort the process (exit 87, STALLED marker) if no epoch completes
    # within this window — a wedged remote-device tunnel blocks the
    # loop in an uninterruptible native wait, so a hard exit is the
    # only way back to the launcher (utils/watchdog.py). 0 = off.
    stall_timeout_s: float = 0.0
    exploit_every: int = 20
    exploit: bool = True
    # eval_mse/{net_reach,fp_reach} diagnostics during exploit evals
    # (compute_stats_with_net, pybind.cc:57-84; selfplay.py:568-570).
    eval_mse: bool = False
    # Sampled-eval repeats for the in-training exploit eval (0 = single
    # sample only). Defaults to 8 so the headline metric is the averaged
    # `exploitability_avg` rather than the noisy single-sample
    # `exploitability_last` (recursive_eval.cc:344-386 is the protocol
    # this mirrors at small repeat counts).
    eval_num_repeats: int = 8
    # Validation snapshots from replay (selfplay.py:352-362) and dataset
    # dumps (selfplay.py:364-375) and buffer purging (selfplay.py:513-521).
    create_validation_set_every: int = 100
    validation_batches: int = 16
    # Dataset preload before training (selfplay.py:273-278, 613-621).
    train_preload: str | None = None
    # Benchmark modes (selfplay.py:285-293, 474-481): benchmark_data_gen
    # generates for ~N seconds with no training, logs the reference's
    # "BENCHMARK size ... speed ..." line and returns; fake_training runs
    # the full epoch loop but skips the train step, so generation speed
    # can be read without sampling/update cost.
    benchmark_data_gen: float = 0.0
    fake_training: bool = False
    dump_dataset_every_epochs: int = 0
    purging_epochs: tuple = ()
    purging_share_keep: float = 0.0
    solver_dtype: Any = jnp.float32


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    replay: rb.Replay
    episodes: EpisodeState
    key: jax.Array
    epoch: jnp.ndarray  # i32


def lr_schedule(cfg: TrainerConfig, steps_per_epoch: int):
    """Manual halving schedule (selfplay.py:341-351): at the start of
    epoch ``k * decrease_lr_every - 1`` the lr halves, at most
    ``decrease_lr_times`` times."""

    def schedule(step):
        epoch = step // steps_per_epoch
        decays = (epoch + 1) // cfg.decrease_lr_every
        if cfg.decrease_lr_times:
            decays = jnp.minimum(decays, cfg.decrease_lr_times)
        # NB: falsy decrease_lr_times means UNLIMITED halvings in the
        # reference ('if not decrease_lr_times or num_decays < ...',
        # selfplay.py:344-351), not zero.
        return cfg.lr * 0.5**decays

    return schedule


def huber(x: jnp.ndarray) -> jnp.ndarray:
    """Reference's custom huber (selfplay.py:135-139)."""
    ax = jnp.abs(x)
    return jnp.where(ax > 1, ax * 2 - 1, x * x)


def bucket_metrics(game, counts, loss_sums, val_sums) -> dict:
    """Per-last-action loss/value/share metrics (selfplay.py:449-458),
    shared by the single-process and SPMD epoch loops."""
    out = {}
    total = counts.sum()
    for a in range(game.num_actions + 1):
        name = "initial" if a == game.num_actions else a
        if counts[a] > 0:
            out[f"loss/train_{name}"] = float(loss_sums[a] / counts[a])
            out[f"val/train_{name}"] = float(val_sums[a] / counts[a])
        out[f"shares/train_{name}"] = float(counts[a] / total)
    return out


def last_action_index(queries: jnp.ndarray, num_actions: int) -> jnp.ndarray:
    """Index of the one-hot last action; ``num_actions`` when the query is
    for the initial state (get_last_action_index, selfplay.py:624-633)."""
    onehot = queries[:, 2 : 2 + num_actions]
    has = onehot.max(-1) > 0.5
    return jnp.where(has, onehot.argmax(-1), num_actions).astype(jnp.int32)


def _make_optimizer(cfg: TrainerConfig, lr) -> optax.GradientTransformation:
    """Optimizer families mirroring the reference's
    conf/common/optimizer/{adam,sgd,radam,ralamb}.yaml (classnames
    Adam / SGD / hey.optimizers.RAdam / hey.optimizers.Ralamb).
    Ralamb = RAdam update rescaled by the LAMB layer-wise trust ratio."""
    name = cfg.optimizer.lower()
    if name == "adam":
        return optax.adam(lr)
    if name == "sgd":
        return optax.sgd(lr, momentum=cfg.momentum)
    if name == "radam":
        return optax.radam(lr)
    if name == "ralamb":
        return optax.chain(
            optax.scale_by_radam(),
            optax.scale_by_trust_ratio(),
            optax.scale_by_learning_rate(lr),
        )
    raise ValueError(f"Unknown optimizer: {cfg.optimizer!r}")


class Trainer:
    def __init__(self, cfg: TrainerConfig, out_dir: str | pathlib.Path = "."):
        self.cfg = cfg
        self.game: LiarsDice = cfg.env.game
        self.out_dir = pathlib.Path(out_dir)
        self.engine = make_engine(
            cfg.env,
            dtype=cfg.solver_dtype,
            kind=cfg.engine,
            net_compute_dtype=cfg.net_compute_dtype,
        )
        self.net_spec = CFVNetSpec(
            game=self.game,
            n_hidden=cfg.n_hidden,
            n_layers=cfg.n_layers,
            use_layer_norm=cfg.use_layer_norm,
        )
        self.steps_per_epoch = cfg.train_epoch_size // cfg.train_batch_size
        self.opt = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            _make_optimizer(cfg, lr_schedule(cfg, self.steps_per_epoch)),
        )
        self.num_decays = 0
        self._build_programs()

    # ------------------------------------------------------------- init
    def init_state(self) -> TrainState:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        key, k_net = jax.random.split(key)
        params = self.net_spec.init_params(k_net)
        return TrainState(
            params=params,
            opt_state=self.opt.init(params),
            replay=rb.create(
                cfg.replay_capacity, self.game.query_size, self.game.num_hands
            ),
            episodes=EpisodeState.initial_batch(
                self.game, cfg.selfplay_batch, cfg.solver_dtype
            ),
            key=key,
            epoch=jnp.int32(0),
        )

    # --------------------------------------------------------- programs
    def _build_programs(self):
        cfg = self.cfg
        engine = self.engine
        net_spec = self.net_spec
        game = self.game

        def gen_chunk(params, episodes, replay, key):
            """`gen_chunk_steps` lockstep engine steps; each pushes
            2 * selfplay_batch examples with priority 1
            (data_loop.h:50-55)."""
            net_arg = (
                params
                if getattr(engine, "wants_params", False)
                else net_spec.value_fn(params)
            )

            def body(carry, k):
                eps, rep = carry
                keys = jax.random.split(k, cfg.selfplay_batch)
                eps, out = engine.batch_step(eps, keys, net_arg)
                q = out.queries.reshape(-1, game.query_size)
                v = out.values.reshape(-1, game.num_hands)
                rep = rb.add(rep, q, v, 1.0, cfg.replay_alpha)
                return (eps, rep), out.ended.sum()

            keys = jax.random.split(key, cfg.gen_chunk_steps)
            (episodes, replay), ended = jax.lax.scan(
                body, (episodes, replay), keys
            )
            return episodes, replay, ended.sum()

        def loss_fn(params, queries, targets):
            pred = net_spec.module.apply(params, queries)
            err = targets - pred
            per_ex = (
                huber(err) if cfg.loss == "huber" else err * err
            ).mean(-1)
            loss = per_ex.mean()
            return loss, per_ex

        def train_step(params, opt_state, replay, key):
            sample = (
                rb.sample_prioritized(
                    replay, key, cfg.train_batch_size, cfg.replay_beta
                )
                if cfg.use_priority
                else rb.sample_uniform(replay, key, cfg.train_batch_size)
            )
            (loss, per_ex), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, sample.queries, sample.values)
            g_norm = optax.global_norm(grads)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # Per-last-action buckets (selfplay.py:158-170).
            bucket = last_action_index(sample.queries, game.num_actions)
            nb = game.num_actions + 1
            counts = jnp.zeros(nb).at[bucket].add(1.0)
            loss_sums = jnp.zeros(nb).at[bucket].add(per_ex)
            val_sums = jnp.zeros(nb).at[bucket].add(sample.values.sum(-1))
            stats = dict(
                loss=loss,
                g_norm=g_norm,
                counts=counts,
                loss_sums=loss_sums,
                val_sums=val_sums,
            )
            return params, opt_state, stats

        def train_chunk(params, opt_state, replay, key, n):
            def body(carry, k):
                p, o = carry
                p, o, stats = train_step(p, o, replay, k)
                return (p, o), stats

            keys = jax.random.split(key, n)
            (params, opt_state), stats = jax.lax.scan(
                body, (params, opt_state), keys
            )
            return params, opt_state, stats

        self._gen_chunk = jax.jit(gen_chunk, donate_argnums=(2,))
        self._train_chunk = jax.jit(
            train_chunk, static_argnums=(4,), donate_argnums=(1,)
        )
        self._loss_eval = jax.jit(
            lambda params, q, v: loss_fn(params, q, v)[0]
        )

    # ------------------------------------------------------------ epochs
    def run(self, state: TrainState | None = None, max_epochs=None):
        cfg = self.cfg
        state = state or self.init_state()
        max_epochs = max_epochs or cfg.max_epochs
        train_size = cfg.train_epoch_size
        batch = cfg.train_batch_size
        gen_rows = 2 * cfg.selfplay_batch * cfg.gen_chunk_steps
        metrics_path = self.out_dir / "metrics.jsonl"
        self.out_dir.mkdir(parents=True, exist_ok=True)
        gen_time = train_time = 0.0
        gen_rows_total = 0

        # Dataset preload (selfplay.py:273-278): load a reference-format
        # dump into the replay before generation starts.
        if cfg.train_preload and int(state.replay.num_add) == 0:
            log.info("Preloading dataset from %s", cfg.train_preload)
            state = state._replace(
                replay=rb.load_into(state.replay, cfg.train_preload)
            )

        # Baselines for throughput metrics: num_add at entry covers both
        # preloads and resumes (the reference subtracts preloaded_size,
        # selfplay.py:329-332), and per-epoch timings divide by epochs
        # run in THIS process, not the absolute epoch index.
        num_add_base = int(state.replay.num_add)
        epoch_base = int(state.epoch)

        # Generation-speed benchmark (selfplay.py:285-293): generate for
        # ~benchmark_data_gen seconds with no training, log the
        # reference's BENCHMARK line, and return.
        if cfg.benchmark_data_gen:
            t0 = time.time()
            while time.time() - t0 < cfg.benchmark_data_gen:
                state = self._gen(state)
            size = int(state.replay.num_add) - num_add_base  # syncs device
            elapsed = time.time() - t0
            log.info("BENCHMARK size %s speed %.2f", size, size / elapsed)
            metrics = {
                "benchmark/examples": size,
                "benchmark/examples_per_s": size / elapsed,
                "benchmark/seconds": elapsed,
            }
            with open(metrics_path, "a") as f:
                f.write(json.dumps(metrics) + "\n")
            return state, [metrics]

        # Burn-in (selfplay.py:314-327).
        while int(state.replay.size) < 2 * batch:
            state = self._gen(state)

        from rebel_tpu.utils.watchdog import StallWatchdog

        wd = StallWatchdog(cfg.stall_timeout_s, self.out_dir).start()
        all_metrics = []
        val_sets: list[tuple[str, np.ndarray, np.ndarray]] = []
        try:
            for epoch in range(int(state.epoch), max_epochs):
                wd.alive(epoch)
                t_epoch = time.time()
                # Validation snapshots from the replay buffer
                # (selfplay.py:352-362).
                if (
                    cfg.create_validation_set_every
                    and epoch % cfg.create_validation_set_every == 0
                ):
                    key, k_val = jax.random.split(state.key)
                    state = state._replace(key=key)
                    samp = rb.sample_uniform(
                        state.replay, k_val,
                        cfg.validation_batches * cfg.train_batch_size,
                    )
                    val_sets.append(
                        (
                            f"valid_snapshot_{epoch:04d}",
                            np.asarray(samp.queries),
                            np.asarray(samp.values),
                        )
                    )
                # Periodic dataset dump (selfplay.py:364-375).
                if (
                    cfg.dump_dataset_every_epochs
                    and epoch % cfg.dump_dataset_every_epochs == 0
                ):
                    dump_dir = self.out_dir / "dumped_data"
                    dump_dir.mkdir(parents=True, exist_ok=True)
                    rb.save(state.replay, str(dump_dir / f"data_{epoch:03d}.dat"))
                # Throttle: generate until the ratio is satisfied; a falsy
                # ratio disables the throttle entirely (the reference wraps
                # it in `if self.cfg.train_gen_ratio:`, selfplay.py:391-405).
                t0 = time.time()
                while cfg.train_gen_ratio and (
                    int(state.replay.num_add) * cfg.train_gen_ratio
                    < train_size * (epoch + 1)
                ):
                    state = self._gen(state)
                    gen_rows_total += gen_rows
                gen_time += time.time() - t0

                t0 = time.time()
                if cfg.fake_training:
                    # Generation benchmarking: skip the train step so gen
                    # speed is readable without sampling/update cost
                    # (selfplay.py:474-481; no 60 s sleep — the throttle
                    # above already paces generation per nominal epoch).
                    key, _ = jax.random.split(state.key)
                    state = state._replace(
                        key=key, epoch=jnp.int32(epoch + 1)
                    )
                    metrics = {
                        "epoch": epoch,
                        "buffer/size": int(state.replay.size),
                        "buffer/added": int(state.replay.num_add),
                    }
                else:
                    key, k_train = jax.random.split(state.key)
                    params, opt_state, stats = self._train_chunk(
                        state.params,
                        state.opt_state,
                        state.replay,
                        k_train,
                        self.steps_per_epoch,
                    )
                    stats = jax.tree.map(np.asarray, stats)
                    state = state._replace(
                        params=params,
                        opt_state=opt_state,
                        key=key,
                        epoch=jnp.int32(epoch + 1),
                    )
                    metrics = self._epoch_metrics(state, stats, epoch)
                    metrics["bps/train"] = self.steps_per_epoch / max(
                        time.time() - t0, 1e-9
                    )
                    metrics["bps/train_examples"] = metrics["bps/train"] * batch
                train_time += time.time() - t0
                metrics["bps/gen"] = (
                    (int(state.replay.num_add) - num_add_base)
                    / max(gen_time, 1e-9) / batch
                )
                metrics["bps/gen_examples"] = metrics["bps/gen"] * batch
                epochs_run = epoch - epoch_base + 1
                metrics["timing/gen"] = gen_time / epochs_run
                metrics["timing/train"] = train_time / epochs_run

                # Purge the buffer at configured epochs (selfplay.py:513-521).
                if cfg.purging_epochs and (epoch + 1) in cfg.purging_epochs:
                    new_size = max(
                        2 * batch,
                        int(cfg.purging_share_keep * int(state.replay.size)),
                    )
                    state = state._replace(
                        replay=rb.pop_until(state.replay, new_size)
                    )

                if epoch % cfg.checkpoint_every == 0:
                    for name, vq, vv in val_sets:
                        metrics[f"loss/{name}"] = float(
                            self._loss_eval(
                                state.params, jnp.asarray(vq), jnp.asarray(vv)
                            )
                        )
                    self.save_checkpoint(state, epoch)
                if cfg.exploit and cfg.exploit_every and epoch % cfg.exploit_every == 0:
                    t0 = time.time()
                    metrics.update(self.evaluate(state))
                    metrics["timing/exploit"] = time.time() - t0

                log.info(
                    "[Train] epoch %d loss %.6f exploit %s lr %.2e",
                    epoch,
                    metrics.get("loss/train", float("nan")),
                    metrics.get(
                        "exploitability_avg",
                        metrics.get("exploitability_last", "-"),
                    ),
                    metrics.get("optim/lr", float("nan")),
                )
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(metrics) + "\n")
                all_metrics.append(metrics)
                # Liveness for the exp-dir status machine: without a
                # per-epoch touch a healthy run reads DEAD after 300s
                # and gentle_start/start_restart would wipe it.
                (self.out_dir / "heartbeat").touch()
        finally:
            wd.stop()
        return state, all_metrics

    def _gen(self, state: TrainState) -> TrainState:
        key, k = jax.random.split(state.key)
        episodes, replay, _ = self._gen_chunk(
            state.params, state.episodes, state.replay, k
        )
        return state._replace(episodes=episodes, replay=replay, key=key)

    # -------------------------------------------------- SPMD epoch loop
    def run_spmd(self, mesh=None, max_epochs=None, resume=True, hands=1):
        """Epoch loop over the shard_map SPMD programs
        (rebel_tpu.parallel.mesh): self-play lanes and replay rows
        sharded over the mesh's data axis, grads psum'd, params
        replicated.  Works on one process with many devices and on a
        jax.distributed multi-process runtime (one process per host,
        launched by rebel_tpu.parallel.launcher); every process runs
        this same loop, host-side control flow driven by replicated
        scalars so all processes stay in lockstep.

        With ``hands > 1`` (the ``launcher.hands`` config knob) the mesh
        is 2D and each data shard's solver tensors are additionally
        sharded over the hands dimension — SURVEY §5's long-context
        analog, for games whose ``num_hands = faces^dice`` outgrows one
        device.

        Checkpoints are FULL state (params + opt state + the gathered
        device-sharded replay ring, episode states and per-device RNG
        keys + epoch; master only) in ``ckpt/epoch<N>.spmd.ckpt``,
        matching the single-process path's full-state semantics. On
        ``resume`` the sharded state is re-laid onto the mesh, provided
        the data-axis size matches the checkpoint's; on a mesh-size
        mismatch (or an old params-only checkpoint) the rings restart
        empty with the RNG stream seeded past the resume epoch, as
        before. Validation snapshots, dataset dump/preload and buffer
        purging run here too (selfplay.py:352-375,513-521 parity on the
        SPMD path).
        """
        from rebel_tpu.parallel import mesh as meshlib

        cfg = self.cfg
        if mesh is None:
            if hands > 1:
                n_dev = jax.device_count()
                assert n_dev % hands == 0, (
                    f"launcher.hands={hands} must divide the device "
                    f"count {n_dev}"
                )
                mesh = meshlib.make_mesh2(n_dev // hands, hands)
            else:
                mesh = meshlib.make_mesh()
        init_state, gen_step, train_step = meshlib.make_spmd_programs(
            self, mesh, hands_axis="h" if hands > 1 else None
        )
        log.info(
            "[SPMD] mesh %s%s", dict(mesh.shape),
            f" (hands axis 'h' shards num_hands={self.game.num_hands})"
            if hands > 1 else "",
        )
        is_master = jax.process_index() == 0
        max_epochs = max_epochs or cfg.max_epochs
        train_size = cfg.train_epoch_size

        def local(x):
            """Host value of a replicated global array."""
            return np.asarray(x.addressable_data(0))

        n_data = mesh.shape["data"]
        replicated = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        )
        total_added = jax.jit(
            lambda r: r.num_add.sum(), out_shardings=replicated
        )
        total_size = jax.jit(
            lambda r: r.size.sum(), out_shardings=replicated
        )
        # popUntil analog per device ring (prioritized_replay.h:356-361).
        pop_rings = jax.jit(
            lambda r, n: r._replace(
                size=jnp.minimum(r.size, jnp.int32(n))
            ),
            static_argnums=(1,),
        )
        local_keep_min = cfg.train_batch_size // n_data

        start_epoch = 0
        saved = None
        ckpt_dir = self.out_dir / "ckpt"
        if resume and ckpt_dir.exists():
            ckpts = sorted(
                ckpt_dir.glob("epoch*.spmd.ckpt"),
                key=lambda p: int(p.stem.split(".")[0][5:]),
            )
            if ckpts:
                with open(ckpts[-1], "rb") as f:
                    saved = pickle.load(f)
                start_epoch = int(saved["epoch"]) + 1
        # Full-state resume needs the checkpoint's data-axis size to
        # match the current mesh (ring rows and head/size vectors are
        # laid out per device). Otherwise fall back to fresh rings with
        # the self-play RNG stream seeded past the resume point — a
        # resumed run must not replay epoch 0's episodes.
        full_resume = (
            saved is not None
            and "replay" in saved
            and saved.get("n_data") == n_data
        )
        state = init_state(cfg.seed + (0 if full_resume else start_epoch))
        if saved is not None:
            state = state._replace(
                params=meshlib.replicate(mesh, saved["params"]),
                opt_state=meshlib.replicate(mesh, saved["opt_state"]),
            )
            if full_resume:
                state = state._replace(
                    episodes=meshlib.shard_batch(mesh, saved["episodes"]),
                    replay=meshlib.shard_batch(mesh, saved["replay"]),
                    keys=meshlib.shard_batch(mesh, saved["keys"]),
                )
            elif "replay" in saved:
                log.warning(
                    "run_spmd: checkpoint was written on a %s-wide data "
                    "axis but the mesh has %s; replay ring and episode "
                    "states restart empty", saved.get("n_data"), n_data,
                )
            log.info("run_spmd: resumed from %s (epoch %d%s)",
                     ckpts[-1], start_epoch,
                     ", full state" if full_resume else ", params+opt only")
        # Gen-throttle anchor: with full state restored, num_add already
        # carries the pre-resume generation, so the cumulative target
        # counts from epoch 0 (selfplay.py:391-405); with fresh rings it
        # must not demand the pre-resume epochs' generation again.
        throttle_base = 0 if full_resume else start_epoch

        self.out_dir.mkdir(parents=True, exist_ok=True)
        metrics_path = self.out_dir / "metrics.jsonl"
        heartbeat = self.out_dir / "heartbeat"
        all_metrics = []
        val_sets: list[tuple[str, np.ndarray, np.ndarray]] = []
        # Dataset preload (selfplay.py:273-278), SPMD analog: rows are
        # distributed round-robin across the device-local rings. Every
        # process reads the file and lays out identically.
        if cfg.train_preload and int(local(total_added(state.replay))) == 0:
            log.info("Preloading dataset from %s", cfg.train_preload)
            from rebel_tpu.selfplay import replay as rb

            rows_q, rows_v = rb.load_file(cfg.train_preload)
            # The ring arrays are sharded — lay the rows out on an empty
            # host base of the same global shape, then reshard.
            base = type(state.replay)(
                queries=np.zeros(
                    state.replay.queries.shape, np.float32
                ),
                values=np.zeros(state.replay.values.shape, np.float32),
                priorities=np.zeros(
                    state.replay.priorities.shape, np.float32
                ),
                head=np.zeros((n_data,), np.int32),
                size=np.zeros((n_data,), np.int32),
                num_add=np.zeros((n_data,), np.int32),
            )
            state = state._replace(
                replay=meshlib.shard_batch(
                    mesh, meshlib.rows_to_ring(base, rows_q, rows_v, n_data)
                )
            )
        # Generation-speed benchmark (selfplay.py:285-293), SPMD analog:
        # the whole mesh generates for ~N seconds, the master logs the
        # global BENCHMARK line, no training happens.
        if cfg.benchmark_data_gen:
            added0 = int(local(total_added(state.replay)))
            t0 = time.time()
            while time.time() - t0 < cfg.benchmark_data_gen:
                eps, rep, keys = gen_step(
                    state.params, state.episodes, state.replay, state.keys
                )
                state = state._replace(episodes=eps, replay=rep, keys=keys)
            size = int(local(total_added(state.replay))) - added0
            elapsed = time.time() - t0
            metrics = {
                "benchmark/examples": size,
                "benchmark/examples_per_s": size / elapsed,
                "benchmark/seconds": elapsed,
                "spmd/devices": int(mesh.devices.size),
            }
            if is_master:
                log.info("BENCHMARK size %s speed %.2f", size,
                         size / elapsed)
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(metrics) + "\n")
            return state, [metrics]

        # Burn-in (selfplay.py:314-327).
        while int(local(total_added(state.replay))) < (
            4 * cfg.train_batch_size
        ):
            eps, rep, keys = gen_step(
                state.params, state.episodes, state.replay, state.keys
            )
            state = state._replace(episodes=eps, replay=rep, keys=keys)

        from rebel_tpu.utils.watchdog import StallWatchdog

        wd = StallWatchdog(
            cfg.stall_timeout_s, self.out_dir, what="spmd-train"
        ).start()
        try:
            for epoch in range(start_epoch, max_epochs):
                wd.alive(epoch)
                # Validation snapshots from the replay (selfplay.py:352-362),
                # SPMD analog: every process gathers the ring (collective)
                # and samples with the same seed, so processes stay in
                # lockstep and hold identical snapshots; only the master
                # logs the val losses.
                if (
                    cfg.create_validation_set_every
                    and epoch % cfg.create_validation_set_every == 0
                ):
                    host_replay = meshlib.gather_to_host(mesh, state.replay)
                    rows_q, rows_v = meshlib.ring_valid_rows(
                        host_replay, n_data
                    )
                    if len(rows_q):
                        rng = np.random.default_rng(cfg.seed * 9973 + epoch)
                        idx = rng.integers(
                            0, len(rows_q),
                            cfg.validation_batches * cfg.train_batch_size,
                        )
                        val_sets.append(
                            (
                                f"valid_snapshot_{epoch:04d}",
                                rows_q[idx], rows_v[idx],
                            )
                        )
                # Periodic dataset dump (selfplay.py:364-375): master
                # writes the gathered rows in the reference binary format.
                if (
                    cfg.dump_dataset_every_epochs
                    and epoch % cfg.dump_dataset_every_epochs == 0
                ):
                    from rebel_tpu.selfplay import replay as rb

                    host_replay = meshlib.gather_to_host(mesh, state.replay)
                    if is_master:
                        rows_q, rows_v = meshlib.ring_valid_rows(
                            host_replay, n_data
                        )
                        dump_dir = self.out_dir / "dumped_data"
                        dump_dir.mkdir(parents=True, exist_ok=True)
                        rb.save(
                            rb.Replay(
                                queries=rows_q, values=rows_v,
                                priorities=np.ones(len(rows_q), np.float32),
                                head=np.int32(0),
                                size=np.int32(len(rows_q)),
                                num_add=np.int32(len(rows_q)),
                            ),
                            str(dump_dir / f"data_{epoch:03d}.dat"),
                        )
                t0 = time.time()
                while cfg.train_gen_ratio and int(
                    local(total_added(state.replay))
                ) * cfg.train_gen_ratio < train_size * (
                    epoch + 1 - throttle_base
                ):
                    eps, rep, keys = gen_step(
                        state.params, state.episodes, state.replay, state.keys
                    )
                    state = state._replace(episodes=eps, replay=rep, keys=keys)
                gen_s = time.time() - t0

                t0 = time.time()
                step_stats = []
                if not cfg.fake_training:
                    # (fake_training skips the train steps so generation
                    # speed is readable alone, selfplay.py:474-481.)
                    for _ in range(self.steps_per_epoch):
                        params, opt_state, keys, stats = train_step(
                            state.params, state.opt_state, state.replay,
                            state.keys,
                        )
                        state = state._replace(
                            params=params, opt_state=opt_state, keys=keys
                        )
                        step_stats.append(stats)
                train_s = time.time() - t0
                host = [
                    {k: np.asarray(local(v)) for k, v in s.items()}
                    for s in step_stats
                ]
                metrics = {
                    "epoch": epoch,
                    "buffer/added": int(local(total_added(state.replay))),
                    "timing/gen": gen_s,
                    "timing/train": train_s,
                    "spmd/devices": int(mesh.devices.size),
                    "spmd/processes": jax.process_count(),
                }
                if host:
                    g_norms = np.asarray([s["g_norm"] for s in host])
                    metrics.update({
                        "loss/train": float(
                            np.mean([s["loss"] for s in host])
                        ),
                        "optim/lr": float(
                            lr_schedule(cfg, 1)(jnp.asarray(epoch))
                        ),
                        "optim/grad_max": float(g_norms.max()),
                        "optim/grad_mean": float(g_norms.mean()),
                    })
                    metrics.update(
                        bucket_metrics(
                            self.game,
                            sum(s["counts"] for s in host),
                            sum(s["loss_sums"] for s in host),
                            sum(s["val_sums"] for s in host),
                        )
                    )
                # Buffer purge at configured epochs (selfplay.py:513-521):
                # each device ring keeps its share of the global target.
                if cfg.purging_epochs and (epoch + 1) in cfg.purging_epochs:
                    keep_local = max(
                        2 * local_keep_min,
                        int(
                            cfg.purging_share_keep
                            * int(local(total_size(state.replay)))
                        )
                        // n_data,
                    )
                    state = state._replace(
                        replay=pop_rings(state.replay, keep_local)
                    )
                # Full-state checkpoint: the gather is a collective, so
                # every process joins it; only the master writes.
                do_ckpt = epoch % cfg.checkpoint_every == 0
                if do_ckpt:
                    full_host = {
                        "episodes": meshlib.gather_to_host(
                            mesh, state.episodes
                        ),
                        "replay": meshlib.gather_to_host(mesh, state.replay),
                        "keys": meshlib.gather_to_host(mesh, state.keys),
                    }
                if is_master:
                    heartbeat.touch()
                    if cfg.exploit and cfg.exploit_every and (
                        epoch % cfg.exploit_every == 0
                    ):
                        # Master-only in-training exploitability, as on the
                        # single-process path (selfplay.py:555-570). Runs on
                        # the master's local device; other ranks simply wait
                        # at their next collective.
                        t0 = time.time()
                        metrics.update(
                            self.evaluate_params(
                                jax.tree.map(local, state.params)
                            )
                        )
                        metrics["timing/exploit"] = time.time() - t0
                    log.info(
                        "[SPMD] epoch %d loss %.6f exploit %s (%d devices, "
                        "%d procs)",
                        epoch, metrics.get("loss/train", float("nan")),
                        metrics.get(
                            "exploitability_avg",
                            metrics.get("exploitability_last", "-"),
                        ),
                        mesh.devices.size, jax.process_count(),
                    )
                    if do_ckpt:
                        # Validation losses on the snapshot sets at
                        # checkpoint epochs (selfplay.py:523-552 parity).
                        for name, vq, vv in val_sets:
                            metrics[f"loss/{name}"] = float(
                                self._loss_eval(
                                    jax.tree.map(local, state.params),
                                    jnp.asarray(vq), jnp.asarray(vv),
                                )
                            )
                    with open(metrics_path, "a") as f:
                        f.write(json.dumps(metrics) + "\n")
                    if do_ckpt:
                        ckpt_dir.mkdir(parents=True, exist_ok=True)
                        host = {
                            "params": jax.tree.map(local, state.params),
                            "opt_state": jax.tree.map(local, state.opt_state),
                            "epoch": epoch,
                            "n_data": n_data,
                            **full_host,
                        }
                        tmp = ckpt_dir / f".epoch{epoch}.spmd.ckpt.tmp"
                        with open(tmp, "wb") as f:
                            pickle.dump(host, f)
                        tmp.replace(ckpt_dir / f"epoch{epoch}.spmd.ckpt")
                        # Inference-only params export (eval interchange).
                        tmp = ckpt_dir / f".epoch{epoch}.params.tmp"
                        with open(tmp, "wb") as f:
                            pickle.dump(host["params"], f)
                        tmp.replace(ckpt_dir / f"epoch{epoch}.params")
                        # Retention, as on the single-process path: keep
                        # the last keep_checkpoints resumable state files
                        # (.params exports are small and all kept).
                        if cfg.keep_checkpoints:
                            spmd = sorted(
                                ckpt_dir.glob("epoch*.spmd.ckpt"),
                                key=lambda p: int(
                                    p.name.split(".")[0][5:]
                                ),
                            )
                            for old in spmd[: -cfg.keep_checkpoints]:
                                old.unlink()
                all_metrics.append(metrics)
        finally:
            wd.stop()
        return state, all_metrics

    def _epoch_metrics(self, state, stats, epoch):
        cfg = self.cfg
        game = self.game
        metrics = {
            "epoch": epoch,
            "optim/lr": float(
                lr_schedule(cfg, 1)(jnp.asarray(epoch))
            ),
            "loss/train": float(stats["loss"].mean()),
            "optim/grad_max": float(stats["g_norm"].max()),
            "optim/grad_mean": float(stats["g_norm"].mean()),
            "optim/grad_clip_ratio": float(
                (stats["g_norm"] >= cfg.grad_clip - 1e-5).mean()
            ),
            "buffer/size": int(state.replay.size),
            "buffer/added": int(state.replay.num_add),
        }
        metrics.update(
            bucket_metrics(
                game,
                stats["counts"].sum(0),
                stats["loss_sums"].sum(0),
                stats["val_sums"].sum(0),
            )
        )
        return metrics

    # ------------------------------------------------------------- eval
    def evaluate(self, state: TrainState) -> dict:
        """In-training exploitability via recursive solving to leaf with
        the current net (compute_stats_with_net, pybind.cc:57-84)."""
        return self.evaluate_params(state.params)

    def evaluate_params(self, params) -> dict:
        """:meth:`evaluate` on bare net params (shared by the
        single-process and SPMD epoch loops)."""
        from rebel_tpu.eval.recursive import compute_strategy_recursive_to_leaf
        from rebel_tpu.solving.exploitability import (
            compute_exploitability,
            full_tree_context,
        )

        value_fn = self.net_spec.value_fn(params)
        strategy = compute_strategy_recursive_to_leaf(
            self.game,
            self.cfg.env.subgame_params,
            value_fn,
            dtype=self.cfg.solver_dtype,
        )
        ctx = full_tree_context(self.game, self.cfg.solver_dtype)
        expl = compute_exploitability(ctx, strategy)
        out = {"exploitability_last": float(expl)}
        if self.cfg.eval_num_repeats > 0:
            # Averaged sampled eval (the reference's phase-2 protocol at
            # small repeat counts, recursive_eval.cc:344-386): tames the
            # noisy single-sample exploitability_last metric.
            from rebel_tpu.eval.recursive_eval import sampled_eval

            _, reports = sampled_eval(
                self.game,
                self.cfg.env.subgame_params,
                value_fn,
                self.cfg.eval_num_repeats,
                full_strategy=None,
                mdp_depth=self.cfg.env.subgame_params.max_depth,
                dtype=self.cfg.solver_dtype,
                progress=False,
            )
            out["exploitability_avg"] = reports[-1]["exploitability"]
        if self.cfg.eval_mse and not getattr(
            self, "_eval_mse_broken", False
        ):
            # Net-quality MSE diagnostics (compute_stats_with_net,
            # pybind.cc:57-84 -> stats.cc:44-153; logged as eval_mse/*
            # in selfplay.py:568-570).  A diagnostic must never take the
            # training run down with it: on failure, log loudly and
            # disable it for the rest of the run.  (If the failure
            # killed the device runtime itself, the next train step
            # surfaces that on its own.)
            try:
                from rebel_tpu.eval.recursive_eval import full_solve
                from rebel_tpu.eval.stats import eval_net

                sp = self.cfg.env.subgame_params
                full_strategy, _, _ = full_solve(
                    self.game, sp, self.cfg.solver_dtype, progress=False
                )
                for name, by_net in (
                    ("net_reach", True), ("fp_reach", False)
                ):
                    out[f"eval_mse/{name}"] = float(
                        eval_net(
                            self.game,
                            np.asarray(strategy),
                            np.asarray(full_strategy),
                            mdp_depth=sp.max_depth,
                            fp_iters=sp.num_iters,
                            value_fn=value_fn,
                            traverse_by_net=by_net,
                            dtype=self.cfg.solver_dtype,
                        )
                    )
            except Exception:
                log.exception(
                    "eval_mse diagnostics failed; disabling for the "
                    "rest of this run"
                )
                self._eval_mse_broken = True
        return out

    # ------------------------------------------------------ checkpoints
    def save_checkpoint(self, state: TrainState, epoch: int):
        """Full-state checkpoint (params, opt state, replay, episodes,
        RNG, epoch) — an upgrade over the reference's weights-only ckpts
        (selfplay.py:548-552), enabling true resume."""
        ckpt_dir = self.out_dir / "ckpt"
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        host_state = jax.tree.map(np.asarray, state)
        # Atomic write: a kill mid-dump must not leave a truncated
        # checkpoint as the newest one.
        tmp = ckpt_dir / f".epoch{epoch}.ckpt.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(host_state, f)
        tmp.replace(ckpt_dir / f"epoch{epoch}.ckpt")
        # Inference-only params export: the eval interchange format
        # (the reference's TorchScript export role, selfplay.py:551-552).
        tmp = ckpt_dir / f".epoch{epoch}.params.tmp"
        with open(tmp, "wb") as f:
            pickle.dump(jax.tree.map(np.asarray, state.params), f)
        tmp.replace(ckpt_dir / f"epoch{epoch}.params")
        # Retention: prune old full-state checkpoints.
        if self.cfg.keep_checkpoints:
            # NB: skip SPMD checkpoints (epochN.spmd.ckpt) — same glob,
            # different lifecycle and a non-integer stem.
            ckpts = sorted(
                (p for p in ckpt_dir.glob("epoch*.ckpt")
                 if p.stem[5:].isdigit()),
                key=lambda p: int(p.stem[5:]),
            )
            for old in ckpts[: -self.cfg.keep_checkpoints]:
                old.unlink()

    def load_checkpoint(self, path: str) -> TrainState:
        with open(path, "rb") as f:
            host_state = pickle.load(f)
        return jax.tree.map(jnp.asarray, host_state)


def load_params(path: str):
    with open(path, "rb") as f:
        return jax.tree.map(jnp.asarray, pickle.load(f))
