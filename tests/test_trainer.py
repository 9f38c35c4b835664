"""Trainer integration tests: end-to-end epochs on CPU, metric-name
parity with the reference (cfvpy/selfplay.py), checkpoint resume, and
the SPMD mesh programs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rebel_tpu.selfplay.runner import RecursiveSolvingParams
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.training.trainer import Trainer, TrainerConfig, lr_schedule


def small_cfg(**kw):
    defaults = dict(
        env=RecursiveSolvingParams(
            num_dice=1,
            num_faces=3,
            subgame_params=SubgameSolvingParams(
                num_iters=16, max_depth=2, linear_update=True, use_cfr=True
            ),
            random_action_prob=0.25,
            sample_leaf=True,
        ),
        n_hidden=32,
        n_layers=1,
        train_epoch_size=128,
        train_batch_size=32,
        replay_capacity=2048,
        selfplay_batch=16,
        max_epochs=3,
        exploit=False,
        checkpoint_every=2,
        create_validation_set_every=2,
        solver_dtype=jnp.float32,
    )
    defaults.update(kw)
    return TrainerConfig(**defaults)


def test_trainer_epochs_and_metrics(tmp_path):
    trainer = Trainer(small_cfg(), out_dir=tmp_path)
    state, metrics = trainer.run()
    assert len(metrics) == 3
    m = metrics[-1]
    # Reference metric names (selfplay.py:377-500).
    for key in (
        "loss/train",
        "optim/lr",
        "optim/grad_max",
        "optim/grad_clip_ratio",
        "buffer/size",
        "buffer/added",
        "bps/train",
        "bps/gen_examples",
        "shares/train_initial",
    ):
        assert key in m, key
    assert np.isfinite(m["loss/train"])
    assert (tmp_path / "metrics.jsonl").exists()
    # Validation snapshot loss appears at checkpoint epochs.
    assert any(k.startswith("loss/valid_snapshot_") for k in metrics[2])


def test_trainer_resume(tmp_path):
    trainer = Trainer(small_cfg(), out_dir=tmp_path)
    state, _ = trainer.run()
    ck = tmp_path / "ckpt" / "epoch2.ckpt"
    assert ck.exists()
    restored = trainer.load_checkpoint(str(ck))
    assert int(restored.epoch) == 3
    # Continue for 2 more epochs from the restored state.
    state2, metrics2 = trainer.run(restored, max_epochs=5)
    assert int(state2.epoch) == 5
    assert len(metrics2) == 2


def test_lr_schedule_halving():
    cfg = small_cfg(decrease_lr_every=2, decrease_lr_times=2, lr=1.0)
    sched = lr_schedule(cfg, steps_per_epoch=1)
    got = [float(sched(jnp.asarray(e))) for e in range(8)]
    # Halves at the start of epochs 1, 3 (k*every - 1), capped at 2 times.
    assert got == [1.0, 0.5, 0.5, 0.25, 0.25, 0.25, 0.25, 0.25]


def test_spmd_programs_run_and_learn():
    from rebel_tpu.parallel.mesh import make_mesh, make_spmd_programs

    n = 4
    cfg = small_cfg(
        selfplay_batch=2 * n,
        train_batch_size=4 * n,
        train_epoch_size=4 * n,
        replay_capacity=64 * n,
    )
    trainer = Trainer(cfg)
    mesh = make_mesh(n)
    init_state, gen_step, train_step = make_spmd_programs(trainer, mesh)
    st = init_state(seed=1)
    episodes, replay, keys = gen_step(
        st.params, st.episodes, st.replay, st.keys
    )
    assert int(np.asarray(replay.num_add).sum()) == 2 * cfg.selfplay_batch / n * n
    losses = []
    params, opt_state = st.params, st.opt_state
    for _ in range(3):
        episodes, replay, keys = gen_step(params, episodes, replay, keys)
        params, opt_state, keys, stats = train_step(
            params, opt_state, replay, keys
        )
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(l) for l in losses)


def test_run_spmd_hands_mesh(tmp_path):
    """run_spmd(hands=N) — the launcher.hands knob — builds the 2D
    data x hands mesh itself (8 virtual devices -> 4 data x 2 hands for
    1x4f, num_hands=4) and trains."""
    cfg = small_cfg(
        env=RecursiveSolvingParams(
            num_dice=1,
            num_faces=4,  # num_hands=4, divisible by the 2 hands shards
            subgame_params=SubgameSolvingParams(
                num_iters=16, max_depth=2, linear_update=True, use_cfr=True
            ),
            random_action_prob=0.25,
            sample_leaf=True,
        ),
        selfplay_batch=8,
        train_batch_size=8,
        train_epoch_size=8,
        replay_capacity=512,
        max_epochs=1,
        exploit=False,
        checkpoint_every=10**6,
    )
    trainer = Trainer(cfg, out_dir=tmp_path)
    state, metrics = trainer.run_spmd(max_epochs=1, resume=False, hands=2)
    assert len(metrics) == 1
    assert np.isfinite(metrics[-1]["loss/train"])


def test_run_spmd_resume(tmp_path):
    """Killing an SPMD run and rerunning with resume=True continues from
    the last epoch<N>.spmd.ckpt with FULL state: params/opt restored AND
    the device-sharded replay ring, episode states and per-device RNG
    keys — matching the single-process path's full-state semantics
    (trainer.py save_checkpoint), beyond the reference's weights-only
    warm start (selfplay.py:548-552)."""
    import pickle

    cfg = small_cfg(
        selfplay_batch=8,
        train_batch_size=8,
        train_epoch_size=64,
        replay_capacity=512,
        checkpoint_every=1,
        exploit=True,
        exploit_every=2,
    )
    trainer = Trainer(cfg, out_dir=tmp_path)
    state1, metrics1 = trainer.run_spmd(max_epochs=2, resume=False)
    assert [m["epoch"] for m in metrics1] == [0, 1]
    ckpt_path = tmp_path / "ckpt" / "epoch1.spmd.ckpt"
    assert ckpt_path.exists()
    with open(ckpt_path, "rb") as f:
        saved = pickle.load(f)
    # Full state present in the checkpoint.
    for key in ("params", "opt_state", "replay", "episodes", "keys"):
        assert key in saved, key
    added_at_ckpt = int(saved["replay"].num_add.sum())
    assert added_at_ckpt > 0
    sizes_at_ckpt = np.asarray(saved["replay"].size)

    trainer2 = Trainer(cfg, out_dir=tmp_path)
    state2, metrics2 = trainer2.run_spmd(max_epochs=3, resume=True)
    assert [m["epoch"] for m in metrics2] == [2]
    assert np.isfinite(metrics2[0]["loss/train"])
    # Metric parity with the single-process path: per-last-action
    # buckets, grad norms, and the master-only in-training exploit eval
    # (epoch 2 matches exploit_every=2).
    assert "shares/train_initial" in metrics2[0]
    assert np.isfinite(metrics2[0]["optim/grad_max"])
    assert np.isfinite(
        metrics2[0].get(
            "exploitability_avg", metrics2[0].get("exploitability_last")
        )
    )
    # Ring preserved: the resumed run's cumulative added count carries
    # the pre-resume generation (fresh rings would restart at 0 and the
    # old throttle would re-anchor), and its sizes only grow.
    assert metrics2[0]["buffer/added"] >= added_at_ckpt
    from rebel_tpu.parallel import mesh as meshlib
    import jax as _jax

    mesh = meshlib.make_mesh()
    replay2 = meshlib.gather_to_host(mesh, state2.replay)
    assert (np.asarray(replay2.size) >= sizes_at_ckpt).all()
    # Throttle counts from epoch 0 with a restored ring: epoch 2's
    # cumulative quota is 3*64/4 = 48 examples total, already covered by
    # the resumed num_add when it exceeds 48 — generation on resume adds
    # at most one quota's worth, never re-runs the pre-resume epochs.
    assert metrics2[0]["buffer/added"] <= max(added_at_ckpt, 48) + 32


def test_engine_kinds():
    from rebel_tpu.selfplay.fast_runner import (
        FastBatchedEngine,
        FastPallasEngine,
        FastSelfPlayEngine,
        make_engine,
    )
    from rebel_tpu.selfplay.runner import SelfPlayEngine

    cfg = small_cfg().env
    assert isinstance(make_engine(cfg), FastSelfPlayEngine)
    assert isinstance(make_engine(cfg, kind="generic"), SelfPlayEngine)
    assert isinstance(make_engine(cfg, kind="batched"), FastBatchedEngine)
    assert isinstance(make_engine(cfg, kind="pallas"), FastPallasEngine)
    deep = RecursiveSolvingParams(
        num_dice=1, num_faces=3,
        subgame_params=SubgameSolvingParams(num_iters=4, max_depth=3),
    )
    assert isinstance(make_engine(deep), SelfPlayEngine)
    with pytest.raises(ValueError):
        make_engine(deep, kind="pallas")


def test_trainer_with_batched_engine(tmp_path):
    cfg = small_cfg(engine="batched", max_epochs=1, exploit=False)
    trainer = Trainer(cfg, out_dir=tmp_path)
    state, metrics = trainer.run()
    assert np.isfinite(metrics[-1]["loss/train"])


def test_config_engine_passthrough():
    from rebel_tpu.config import cfg_to_trainer_config

    cfg = {
        "env": {"num_dice": 1, "num_faces": 3},
        "selfplay": {"batch": 8, "engine": "batched"},
    }
    tc = cfg_to_trainer_config(cfg)
    assert tc.engine == "batched" and tc.selfplay_batch == 8


def test_optimizer_families():
    """All four reference optimizer families (conf/common/optimizer/
    {adam,sgd,radam,ralamb}.yaml) build and take an update step."""
    from rebel_tpu.training.trainer import _make_optimizer

    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    grads = {"w": jnp.full((4, 3), 0.5), "b": jnp.ones((3,))}
    for name in ("adam", "sgd", "radam", "ralamb"):
        cfg = small_cfg(optimizer=name)
        opt = _make_optimizer(cfg, 1e-3)
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)
        new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        assert np.isfinite(np.asarray(new["w"])).all(), name
    with pytest.raises(ValueError):
        _make_optimizer(small_cfg(optimizer="lion"), 1e-3)


def test_config_optimizer_mapping(tmp_path):
    from rebel_tpu import config as cfglib

    (tmp_path / "optimizer").mkdir()
    (tmp_path / "optimizer" / "sgd.yaml").write_text(
        "classname: SGD\nkwargs:\n  lr: 0.001\n  momentum: 0.9\n"
    )
    (tmp_path / "main.yaml").write_text(
        "defaults:\n  - optimizer: sgd\nenv:\n  num_dice: 1\n  num_faces: 3\n"
    )
    cfg = cfglib.load_yaml_config(tmp_path / "main.yaml")
    tc = cfglib.cfg_to_trainer_config(cfg)
    assert tc.optimizer == "sgd"
    assert tc.lr == 0.001
    assert tc.momentum == 0.9


def test_eval_mse_metrics(tmp_path):
    """exploit evals with eval_mse=True emit eval_mse/{net_reach,fp_reach}
    (compute_stats_with_net pybind.cc:57-84; selfplay.py:568-570)."""
    cfg = small_cfg(
        max_epochs=1, exploit=True, exploit_every=1, eval_mse=True
    )
    trainer = Trainer(cfg, out_dir=tmp_path)
    _, metrics = trainer.run()
    m = metrics[-1]
    assert "exploitability_last" in m
    assert np.isfinite(m["eval_mse/net_reach"])
    assert np.isfinite(m["eval_mse/fp_reach"])


def test_eval_num_repeats_averaged_metric(tmp_path):
    """exploit evals with eval_num_repeats>0 additionally emit the
    averaged sampled-strategy exploitability (the reference's phase-2
    protocol at small repeat counts, recursive_eval.cc:344-386), taming
    the noisy single-sample exploitability_last."""
    cfg = small_cfg(
        max_epochs=1, exploit=True, exploit_every=1, eval_num_repeats=2
    )
    trainer = Trainer(cfg, out_dir=tmp_path)
    _, metrics = trainer.run()
    m = metrics[-1]
    assert np.isfinite(m["exploitability_last"])
    assert np.isfinite(m["exploitability_avg"])
    # The averaged strategy can only be less exploitable than garbage:
    # both are full-tree exploitabilities of valid strategies.
    assert 0.0 <= m["exploitability_avg"] <= 2.0


def test_reference_config_verbatim(tmp_path):
    """The reference's canonical liars_sp.yaml maps onto TrainerConfig
    with no unknown-key errors and the right hyperparameters
    (conf/c02_selfplay/liars_sp.yaml)."""
    from rebel_tpu import config as cfglib

    (tmp_path / "optimizer").mkdir()
    (tmp_path / "optimizer" / "adam.yaml").write_text(
        "classname: Adam\nkwargs:\n  lr: 0.0003\n"
    )
    (tmp_path / "liars_sp.yaml").write_text(
        """
defaults:
  - optimizer: adam
seed: 0
decrease_lr_every: 400
decrease_lr_times: 2
grad_clip: 5.0
env:
  num_dice: 1
  num_faces: 4
  random_action_prob: 0.25
  sample_leaf: true
  subgame_params:
    num_iters: 1024
    max_depth: 2
    linear_update: true
exploit: true
selfplay:
  network_sync_epochs: 1
  dump_dataset_every_epochs: 200
  threads_per_gpu: -1
  models_per_gpu: 1
  cpu_gen_threads: 60
train_gen_ratio: 4
loss: huber
min_buffer_to_send: 2500
max_epochs: 10000
model:
  name: Net2
  kwargs:
    n_hidden: 256
    n_layers: 2
    use_layer_norm: true
create_validation_set_every: 100
data:
  train_epoch_size: 25600
  train_batch_size: 512
replay:
  capacity: 2000000
  alpha: 1.0
  beta: 1.0
  prefetch: 8
  use_priority: false
"""
    )
    cfg = cfglib.load_yaml_config(tmp_path / "liars_sp.yaml")
    cfg.pop("task", None)
    tc = cfglib.cfg_to_trainer_config(cfg)
    assert tc.lr == 3e-4 and tc.optimizer == "adam"
    assert tc.train_epoch_size == 25600 and tc.train_batch_size == 512
    assert tc.replay_capacity == 2_000_000 and not tc.use_priority
    assert tc.create_validation_set_every == 100
    assert tc.dump_dataset_every_epochs == 200
    assert tc.env.num_faces == 4 and tc.env.subgame_params.num_iters == 1024
    assert tc.max_epochs == 10000 and tc.grad_clip == 5.0


def test_run_spmd_checkpoint_retention(tmp_path):
    """run_spmd prunes epoch<N>.spmd.ckpt down to keep_checkpoints (same
    policy as the single-process path); .params exports are all kept."""
    cfg = small_cfg(
        selfplay_batch=8,
        train_batch_size=8,
        train_epoch_size=8,
        replay_capacity=512,
        checkpoint_every=1,
        keep_checkpoints=2,
    )
    trainer = Trainer(cfg, out_dir=tmp_path)
    trainer.run_spmd(max_epochs=5, resume=False)
    spmd = sorted(
        (tmp_path / "ckpt").glob("epoch*.spmd.ckpt"),
        key=lambda p: int(p.name.split(".")[0][5:]),
    )
    assert [p.name for p in spmd] == [
        "epoch3.spmd.ckpt", "epoch4.spmd.ckpt"
    ]
    assert len(list((tmp_path / "ckpt").glob("epoch*.params"))) == 5


def test_spmd_validation_dump_preload_purge(tmp_path):
    """The SPMD path now carries the single-process path's aux
    subsystems: validation snapshots from the gathered ring (with val
    losses at checkpoint epochs), reference-format dataset dumps,
    dataset preload distributed across device rings, and buffer purging
    (selfplay.py:352-375,513-521)."""
    from rebel_tpu.selfplay import replay as rb

    cfg = small_cfg(
        selfplay_batch=8,
        train_batch_size=8,
        train_epoch_size=64,
        replay_capacity=512,
        checkpoint_every=2,
        create_validation_set_every=2,
        dump_dataset_every_epochs=2,
        purging_epochs=(2,),
        purging_share_keep=0.5,
    )
    trainer = Trainer(cfg, out_dir=tmp_path)
    _, metrics = trainer.run_spmd(max_epochs=3, resume=False)
    # Validation snapshot losses logged at the checkpoint epoch.
    ckpt_metrics = [m for m in metrics if "loss/valid_snapshot_0002" in m]
    assert ckpt_metrics and np.isfinite(
        ckpt_metrics[0]["loss/valid_snapshot_0002"]
    )
    # Dataset dump exists and reads back in the reference binary format.
    dump = tmp_path / "dumped_data" / "data_002.dat"
    assert dump.exists()
    q, v = rb.load_file(str(dump))
    assert q.shape[0] == v.shape[0] > 0
    game_qsize = trainer.game.query_size
    assert q.shape[1] == game_qsize

    # Preload: a fresh SPMD run seeded from the dump starts with the
    # rows already distributed across the device rings.
    cfg2 = small_cfg(
        selfplay_batch=8,
        train_batch_size=8,
        train_epoch_size=64,
        replay_capacity=512,
        train_preload=str(dump),
        train_gen_ratio=0,  # no extra generation needed
    )
    trainer2 = Trainer(cfg2, out_dir=tmp_path / "preloaded")
    state2, metrics2 = trainer2.run_spmd(max_epochs=1, resume=False)
    assert metrics2[0]["buffer/added"] >= q.shape[0]
    assert np.isfinite(metrics2[0]["loss/train"])


def test_benchmark_data_gen_mode(tmp_path):
    # Generation-only benchmark (selfplay.py:285-293): generates for ~N
    # seconds, logs BENCHMARK, returns without any training step.
    trainer = Trainer(small_cfg(benchmark_data_gen=0.5), out_dir=tmp_path)
    state, metrics = trainer.run()
    assert len(metrics) == 1
    m = metrics[0]
    assert m["benchmark/examples"] > 0
    assert m["benchmark/examples_per_s"] > 0
    assert int(state.epoch) == 0  # no epochs trained
    # Params untouched: identical to a fresh init with the same seed.
    fresh = Trainer(small_cfg(benchmark_data_gen=0.5), out_dir=tmp_path)
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(fresh.init_state().params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fake_training_mode(tmp_path):
    # fake_training (selfplay.py:474-481): full epoch loop, generation
    # throttle engaged, but the train step is skipped.
    trainer = Trainer(small_cfg(fake_training=True, max_epochs=3), out_dir=tmp_path)
    state, metrics = trainer.run()
    assert len(metrics) == 3
    m = metrics[-1]
    assert "loss/train" not in m  # no training happened
    assert m["bps/gen_examples"] > 0
    # Throttle still paced generation: >= epoch_size*epochs/train_gen_ratio.
    assert m["buffer/added"] >= 128 * 3 // 4
    fresh = Trainer(small_cfg(fake_training=True), out_dir=tmp_path)
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(fresh.init_state().params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spmd_benchmark_modes(tmp_path):
    # benchmark_data_gen and fake_training must also hold on the SPMD
    # path (a cluster-submitted pod hits run_spmd, not run).
    cfg = small_cfg(
        selfplay_batch=8, train_batch_size=8, train_epoch_size=16,
        replay_capacity=256, benchmark_data_gen=0.5,
    )
    trainer = Trainer(cfg, out_dir=tmp_path / "bench")
    state, metrics = trainer.run_spmd(resume=False)
    assert len(metrics) == 1 and metrics[0]["benchmark/examples"] > 0
    assert (tmp_path / "bench" / "metrics.jsonl").exists()

    cfg = small_cfg(
        selfplay_batch=8, train_batch_size=8, train_epoch_size=16,
        replay_capacity=256, fake_training=True, max_epochs=2,
    )
    trainer = Trainer(cfg, out_dir=tmp_path / "fake")
    state, metrics = trainer.run_spmd(resume=False, max_epochs=2)
    assert len(metrics) == 2
    assert "loss/train" not in metrics[-1]
    assert metrics[-1]["buffer/added"] > 0
    fresh = Trainer(cfg, out_dir=tmp_path / "fake2")
    from rebel_tpu.parallel.mesh import make_mesh, make_spmd_programs

    init_state, _, _ = make_spmd_programs(fresh, make_mesh())
    for a, b in zip(
        jax.tree.leaves(jax.tree.map(np.asarray, state.params)),
        jax.tree.leaves(
            jax.tree.map(np.asarray, init_state(cfg.seed).params)
        ),
    ):
        np.testing.assert_array_equal(a, b)
