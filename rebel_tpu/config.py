"""Config / experiment layer — a compact heyhi equivalent.

The reference uses a forked hydra 0.x + submitit
(/root/reference/heyhi/__init__.py): YAML configs with ``defaults:``
composition, free-form dotted CLI overrides, experiment directories keyed
by (config path, sorted overrides), and run modes
``gentle_start/start_restart/start_continue/restart/dryrun``.  This module
reimplements that surface on plain yaml + dataclasses (no Slurm — local
and multi-host JAX runtimes instead).

Config keys intentionally mirror ``conf/c02_selfplay/liars_sp.yaml``, and
``cfg_to_trainer_config`` errors on unknown keys the way the reference's
``create_mdp_config`` does (cfvpy/selfplay.py:587-610).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import logging
import pathlib
import shutil
from typing import Any

import yaml

from rebel_tpu.selfplay.runner import RecursiveSolvingParams
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.training.trainer import TrainerConfig

log = logging.getLogger(__name__)

MODES = (
    "gentle_start",
    "start_restart",
    "start_continue",
    "restart",
    "dryrun",
)


# ------------------------------------------------------------- yaml load
def _deep_update(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v
    return dst


def load_yaml_config(path: str | pathlib.Path) -> dict:
    """Load a config with hydra-style ``defaults:`` composition
    (heyhi/__init__.py:409-444): each entry ``{group: name}`` pulls
    ``<dir>/<group>/<name>.yaml`` under the config's directory."""
    path = pathlib.Path(path)
    raw = yaml.safe_load(path.read_text()) or {}
    cfg: dict = {}
    for entry in raw.pop("defaults", []) or []:
        if isinstance(entry, dict):
            ((group, name),) = entry.items()
            sub = path.parent / group / f"{name}.yaml"
            if not sub.exists():
                sub = path.parent.parent / "common" / group / f"{name}.yaml"
            _deep_update(
                cfg, {group: yaml.safe_load(sub.read_text()) or {}}
            )
        else:
            sub = path.parent / f"{entry}.yaml"
            _deep_update(cfg, yaml.safe_load(sub.read_text()) or {})
    return _deep_update(cfg, raw)


def _coerce(value: str) -> Any:
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


def apply_overrides(cfg: dict, overrides: list[str]) -> dict:
    """Dotted ``key=value`` overrides (run.py:103-109)."""
    for ov in overrides:
        key, _, value = ov.partition("=")
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _coerce(value)
    return cfg


# ------------------------------------------------------- dataclass build
def _build(dc_type, data: dict, path: str = ""):
    fields = {f.name: f for f in dataclasses.fields(dc_type)}
    kwargs = {}
    for k, v in data.items():
        if k not in fields:
            raise ValueError(
                f"Unknown config key '{path}{k}' for {dc_type.__name__} "
                "(mirroring create_mdp_config's unknown-key error, "
                "cfvpy/selfplay.py:597-606)"
            )
        ftype = fields[k].type
        if isinstance(v, dict):
            sub_type = {
                "env": RecursiveSolvingParams,
                "subgame_params": SubgameSolvingParams,
            }.get(k)
            if sub_type is None:
                raise ValueError(f"Unexpected nested config at '{path}{k}'")
            kwargs[k] = _build(sub_type, v, f"{path}{k}.")
        else:
            kwargs[k] = v
    return dc_type(**kwargs)


def cfg_to_trainer_config(cfg: dict) -> TrainerConfig:
    """Map the reference's yaml layout onto :class:`TrainerConfig`."""

    def _check_section(section: str, d: dict, consumed, vestigial=()):
        """Unknown-key errors inside consumed sections (the module's
        create_mdp_config contract applies to every section, not just
        env.*): a typo like optimizer.lr_ or model.kwargs.n_hiden must
        fail loudly, while known-vestigial reference keys are accepted
        with a log line."""
        extra = set(d) - set(consumed) - set(vestigial)
        if extra:
            raise ValueError(
                f"Unknown config keys in {section}: {sorted(extra)}"
            )
        for k in sorted(set(d) & set(vestigial)):
            log.info(
                "config key '%s.%s' accepted but unused in rebel_tpu",
                section, k,
            )

    c = dict(cfg)  # shallow copy; consume known sections
    out: dict[str, Any] = {}
    env = c.pop("env", {})
    if env:
        out["env"] = _build(RecursiveSolvingParams, env, "env.")
    model = c.pop("model", {})
    if model:
        _check_section("model", model, {"kwargs"}, {"name", "classname"})
        kwargs = model.get("kwargs", {})
        _check_section(
            "model.kwargs", kwargs,
            {"n_hidden", "n_layers", "use_layer_norm"}, {"dropout"},
        )
        out["n_hidden"] = kwargs.get("n_hidden", 256)
        out["n_layers"] = kwargs.get("n_layers", 2)
        out["use_layer_norm"] = kwargs.get("use_layer_norm", True)
    opt = c.pop("optimizer", {})
    if opt:
        _check_section(
            "optimizer", opt,
            {"kwargs", "classname", "name", "lr", "momentum"},
        )
        kwargs = opt.get("kwargs", {})
        _check_section(
            "optimizer.kwargs", kwargs, {"lr", "momentum"},
            {"eps", "betas", "weight_decay"},
        )
        # A direct override (optimizer.lr=...) must beat the defaults
        # file's kwargs.lr — the old precedence silently ignored lr
        # sweeps.
        out["lr"] = opt.get("lr", kwargs.get("lr", 3e-4))
        # classname 'Adam' / 'SGD' / 'hey.optimizers.RAdam' /
        # 'hey.optimizers.Ralamb' (conf/common/optimizer/*.yaml).
        cls = opt.get("classname", opt.get("name"))
        if cls:
            out["optimizer"] = str(cls).rsplit(".", 1)[-1].lower()
        if "momentum" in opt or "momentum" in kwargs:
            out["momentum"] = opt.get("momentum", kwargs.get("momentum"))
    data = c.pop("data", {})
    if data:
        _check_section(
            "data", data, {"train_epoch_size", "train_batch_size"}
        )
        out["train_epoch_size"] = data.get("train_epoch_size", 25600)
        out["train_batch_size"] = data.get("train_batch_size", 512)
    replay = c.pop("replay", {})
    if replay:
        _check_section(
            "replay", replay,
            {"capacity", "alpha", "beta", "use_priority"}, {"prefetch"},
        )
        out["replay_capacity"] = int(replay.get("capacity", 2_000_000))
        out["replay_alpha"] = replay.get("alpha", 1.0)
        out["replay_beta"] = replay.get("beta", 1.0)
        out["use_priority"] = replay.get("use_priority", False)
    selfplay = c.pop("selfplay", {})
    if selfplay:
        _check_section(
            "selfplay", selfplay,
            {"batch", "cpu_gen_threads", "engine", "net_compute_dtype",
             "dump_dataset_every_epochs"},
            {"network_sync_epochs", "threads_per_gpu", "models_per_gpu"},
        )
        out["selfplay_batch"] = selfplay.get(
            "batch", selfplay.get("cpu_gen_threads", 60) * 16
        )
        if "engine" in selfplay:
            out["engine"] = selfplay["engine"]
        if "net_compute_dtype" in selfplay:
            import jax.numpy as jnp

            name = {"bf16": "bfloat16", "f32": "float32"}.get(
                selfplay["net_compute_dtype"],
                selfplay["net_compute_dtype"],
            )
            out["net_compute_dtype"] = getattr(jnp, name)
        if "dump_dataset_every_epochs" in selfplay:
            out["dump_dataset_every_epochs"] = selfplay[
                "dump_dataset_every_epochs"
            ]
    direct = {
        "seed",
        "decrease_lr_every",
        "decrease_lr_times",
        "grad_clip",
        "loss",
        "train_gen_ratio",
        "max_epochs",
        "exploit",
        "exploit_every",
        "eval_mse",
        "eval_num_repeats",
        "checkpoint_every",
        "keep_checkpoints",
        "create_validation_set_every",
        "dump_dataset_every_epochs",
        "purging_epochs",
        "purging_share_keep",
        "train_preload",
        "stall_timeout_s",
        "benchmark_data_gen",
        "fake_training",
    }
    for k in list(c):
        if k in direct:
            out[k] = c.pop(k)
    # Reference keys that do not map onto the fused design are accepted
    # and ignored with a log line (vestigial: min_buffer_to_send is unused
    # even in the reference — SURVEY §2.2).
    ignored = {
        "task",
        "min_buffer_to_send",
        "show_progress_bar",
        "train_policy",
    }
    for k in list(c):
        if k in ignored:
            log.info("config key '%s' accepted but unused in rebel_tpu", k)
            c.pop(k)
    if c:
        raise ValueError(f"Unknown config keys: {sorted(c)}")
    return TrainerConfig(**out)


# --------------------------------------------------------- experiments
def exp_dir_for(
    cfg_path: str, overrides: list[str], root: str = "outputs",
    adhoc: bool = False,
) -> pathlib.Path:
    """Experiment dir keyed by config + sorted overrides
    (heyhi/__init__.py:299-329); --adhoc adds a content hash so reruns
    get fresh dirs."""
    name = pathlib.Path(cfg_path).stem
    parts = [ov.replace("/", "_") for ov in sorted(overrides)]
    key = "-".join(parts) if parts else "default"
    if len(key) > 120 or adhoc:
        import time

        payload = [cfg_path, sorted(overrides)]
        if adhoc:
            payload.append(time.time_ns())  # fresh dir per adhoc run
        h = hashlib.sha1(json.dumps(payload).encode()).hexdigest()[:8]
        key = f"{key[:80]}-{h}" if not adhoc else f"adhoc-{h}-{key[:60]}"
    return pathlib.Path(root) / name / key


def exp_status(exp_dir: pathlib.Path) -> str:
    """NOT_STARTED / RUNNING / DONE / DEAD (heyhi/__init__.py:126-131),
    with liveness via a heartbeat file instead of squeue."""
    if not exp_dir.exists():
        return "NOT_STARTED"
    if (exp_dir / "result.json").exists():
        return "DONE"
    hb = exp_dir / "heartbeat"
    if hb.exists():
        import time

        if time.time() - hb.stat().st_mtime < 300:
            return "RUNNING"
        return "DEAD"
    return "DEAD" if any(exp_dir.iterdir()) else "NOT_STARTED"


def handle_dst(exp_dir: pathlib.Path, mode: str) -> bool:
    """Decide whether to (re)run; may wipe the dir
    (heyhi/__init__.py:333-356).  Returns True when the caller should
    proceed with the run."""
    status = exp_status(exp_dir)
    log.info("Experiment dir %s status=%s mode=%s", exp_dir, status, mode)
    if mode == "dryrun":
        return False
    if mode == "gentle_start":
        if status in ("RUNNING", "DONE"):
            log.info("Already %s; not starting (gentle_start)", status)
            return False
        if status == "DEAD":
            shutil.rmtree(exp_dir)
    elif mode == "start_restart":
        if status == "RUNNING":
            return False
        if status in ("DEAD", "DONE"):
            shutil.rmtree(exp_dir)
    elif mode == "restart":
        if exp_dir.exists():
            shutil.rmtree(exp_dir)
    elif mode == "start_continue":
        pass  # resume from latest checkpoint if present
    else:
        raise ValueError(f"Unknown mode {mode}; choose from {MODES}")
    exp_dir.mkdir(parents=True, exist_ok=True)
    return True


def latest_checkpoint(exp_dir: pathlib.Path) -> pathlib.Path | None:
    """Newest full-state checkpoint (epoch<N>.ckpt; N-integer stems only
    — epoch<N>.spmd.ckpt files have their own resume path)."""
    ckpts = sorted(
        (p for p in (exp_dir / "ckpt").glob("epoch*.ckpt")
         if p.stem[5:].isdigit()),
        key=lambda p: int(p.stem[5:]),
    ) if (exp_dir / "ckpt").exists() else []
    return ckpts[-1] if ckpts else None
