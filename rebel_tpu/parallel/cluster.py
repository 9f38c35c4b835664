"""Managed-cluster submission — the heyhi/submitit Slurm role, TPU-native.

The reference submits experiments to a Slurm cluster through submitit
(/root/reference/heyhi/__init__.py:361-406: partition/time/nodes/gpus
derived from cfg) and polls job state via squeue
(/root/reference/heyhi/__init__.py:192-222).  The TPU-native deployment
unit is a *TPU slice on a managed pod cluster*; this module renders and
submits the three standard forms:

- ``gke``:    a JobSet manifest for GKE TPU node pools (one Job per
              slice, one pod per TPU host; GKE injects
              ``TPU_WORKER_HOSTNAMES``/``TPU_WORKER_ID`` so
              :mod:`rebel_tpu.parallel.distributed` auto-joins the SPMD
              runtime with zero extra flags), applied with ``kubectl``.
- ``xpk``:    an ``xpk workload create`` command line (Google's
              Accelerated-Processing-Kit front end over the same GKE
              JobSet machinery).
- ``gcloud``: ``gcloud compute tpus queued-resources create`` plus the
              ``ssh --worker=all`` run command for plain Cloud TPU VMs.

All three embed the same resume-safe child command
(``python run.py --mode start_continue --exp_dir ...``), so a
preempted/restarted pod continues from the newest full-state checkpoint
— the submitit ``signal_delay_s`` requeue role, done with JobSet
``failurePolicy.maxRestarts`` instead of SIGUSR1 gymnastics.

Without the backend CLI on PATH (this container), ``submit`` degrades to
a dry run: the manifest/commands are written under ``<exp_dir>/cluster/``
and logged, never silently skipped.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import pathlib
import shlex
import shutil
import subprocess

log = logging.getLogger(__name__)

# Best-effort accelerator table: GKE nodeSelector label, chips per host
# VM, and the chip count encoding of the type name.  v4/v5p names count
# TensorCores (2 per chip); v5e/v6e names count chips.  ``topology`` and
# ``num_hosts`` overrides in ClusterConfig are authoritative when a
# slice shape is not in the table.
_FAMILIES = {
    "v5litepod": dict(label="tpu-v5-lite-podslice", chips_per_host=4,
                      cores_per_chip=1),
    "v6e": dict(label="tpu-v6e-slice", chips_per_host=4, cores_per_chip=1),
    "v5p": dict(label="tpu-v5p-slice", chips_per_host=4, cores_per_chip=2),
    "v4": dict(label="tpu-v4-podslice", chips_per_host=4, cores_per_chip=2),
}

# Standard 2D topologies for v5e/v6e slice sizes (chips -> "AxB").
_TOPO_2D = {1: "1x1", 4: "2x2", 8: "2x4", 16: "4x4", 32: "4x8",
            64: "8x8", 128: "8x16", 256: "16x16"}
# Standard 3D topologies for v4/v5p slice sizes (chips -> "AxBxC").
_TOPO_3D = {4: "2x2x1", 8: "2x2x2", 16: "2x2x4", 32: "2x4x4",
            64: "4x4x4", 128: "4x4x8", 256: "4x8x8"}


@dataclasses.dataclass
class ClusterConfig:
    """Submission parameters (the heyhi slurm block's analog:
    partition -> cluster/project/zone, num_gpus -> tpu_type/num_slices,
    hours -> hours, constraint -> tpu_type)."""

    backend: str = "gke"  # 'gke' | 'xpk' | 'gcloud'
    tpu_type: str = "v5litepod-16"
    num_slices: int = 1
    cluster: str = ""
    project: str = ""
    zone: str = ""
    image: str = "rebel-tpu:latest"
    namespace: str = "default"
    hours: float = 72.0
    max_restarts: int = 3
    # Authoritative overrides when tpu_type is not in the table.
    topology: str = ""
    num_hosts: int = 0
    runtime_version: str = "tpu-ubuntu2204-base"  # gcloud only
    # Shared storage for the experiment dir — REQUIRED for the
    # restart-with-resume semantics to hold on GKE: without it each pod
    # checkpoints to its own ephemeral filesystem and a JobSet restart
    # starts from scratch (and ranks could resume divergent states).
    # Exactly one of gcs_bucket (mounted via the GCS FUSE CSI driver)
    # or pvc (a ReadWriteMany PersistentVolumeClaim) should be set;
    # both mount at workdir, which is also the pods' working directory
    # — submit with out_root under workdir so every pod sees the same
    # exp dir.
    gcs_bucket: str = ""
    pvc: str = ""
    workdir: str = "/workspace"


def slice_shape(cfg: ClusterConfig) -> tuple[int, int, str]:
    """(hosts_per_slice, chips_per_host, gke topology) for cfg.tpu_type."""
    family, _, size = cfg.tpu_type.partition("-")
    if family not in _FAMILIES:
        raise ValueError(
            f"unknown TPU family {family!r} (known: {sorted(_FAMILIES)}); "
            "set cluster.num_hosts and cluster.topology explicitly"
        )
    fam = _FAMILIES[family]
    if not size.isdigit():
        raise ValueError(f"malformed tpu_type {cfg.tpu_type!r}")
    chips = int(size) // fam["cores_per_chip"]
    hosts = cfg.num_hosts or max(1, chips // fam["chips_per_host"])
    topo_table = _TOPO_2D if fam["cores_per_chip"] == 1 else _TOPO_3D
    topo = cfg.topology or topo_table.get(chips, "")
    if not topo:
        raise ValueError(
            f"no standard topology for {chips} chips of {family}; set "
            "cluster.topology explicitly"
        )
    return hosts, min(chips, fam["chips_per_host"]), topo


def accelerator_label(cfg: ClusterConfig) -> str:
    family = cfg.tpu_type.partition("-")[0]
    return _FAMILIES[family]["label"]


def child_command(exp_dir: str, cfg_path: str, overrides: list[str]) -> list[str]:
    """The resume-safe in-pod command: every (re)start continues from the
    newest full-state checkpoint in the shared exp dir."""
    return (
        ["python", "run.py", "--cfg", cfg_path, "--mode", "start_continue",
         "--exp_dir", exp_dir]
        + list(overrides)
    )


def job_name(exp_dir: pathlib.Path) -> str:
    """RFC-1123 job name derived from the experiment dir (the
    heyhi exp_id role). A short hash of the full path disambiguates
    experiments whose dir *names* coincide (e.g. every no-override
    experiment is named 'default') so one submission can never clobber
    another's JobSet."""
    import hashlib

    raw = exp_dir.name.lower()
    safe = "".join(ch if ch.isalnum() or ch == "-" else "-" for ch in raw)
    safe = safe.strip("-") or "rebel"
    digest = hashlib.sha1(
        str(pathlib.Path(exp_dir).resolve()).encode()
    ).hexdigest()[:6]
    # Leave headroom for JobSet's generated child names
    # (<jobset>-<replicatedJob>-<idx>-<pod-suffix> must also fit 63).
    return ("rebel-" + safe)[:33].rstrip("-") + "-" + digest


def render_jobset(
    name: str, cluster: ClusterConfig, command: list[str]
) -> str:
    """JobSet manifest: ``num_slices`` replicated Jobs, one pod per TPU
    host, exclusive slice placement, restart-with-resume on failure."""
    import yaml

    hosts, chips_per_host, topo = slice_shape(cluster)
    # Shared exp-dir storage: restart-with-resume only works if every
    # pod (and every restart) sees the same checkpoint files.
    volumes = []
    mounts = []
    annotations = {}
    if cluster.gcs_bucket and cluster.pvc:
        raise ValueError("set cluster.gcs_bucket OR cluster.pvc, not both")
    if cluster.gcs_bucket:
        annotations["gke-gcsfuse/volumes"] = "true"
        volumes.append({
            "name": "shared",
            "csi": {
                "driver": "gcsfuse.csi.storage.gke.io",
                "volumeAttributes": {"bucketName": cluster.gcs_bucket},
            },
        })
    elif cluster.pvc:
        volumes.append({
            "name": "shared",
            "persistentVolumeClaim": {"claimName": cluster.pvc},
        })
    else:
        log.warning(
            "no cluster.gcs_bucket/cluster.pvc set: pods get only "
            "ephemeral storage, so JobSet restarts will NOT resume from "
            "checkpoints"
        )
    if volumes:
        mounts.append({"name": "shared", "mountPath": cluster.workdir})
    manifest = {
        "apiVersion": "jobset.x-k8s.io/v1alpha2",
        "kind": "JobSet",
        "metadata": {"name": name, "namespace": cluster.namespace},
        "spec": {
            # The submitit requeue role: restart the whole set (all
            # hosts of all slices) on any pod failure; each restart
            # resumes via --mode start_continue.
            "failurePolicy": {"maxRestarts": cluster.max_restarts},
            "replicatedJobs": [
                {
                    "name": "slice",
                    "replicas": cluster.num_slices,
                    "template": {
                        "spec": {
                            "parallelism": hosts,
                            "completions": hosts,
                            "backoffLimit": 0,
                            "activeDeadlineSeconds": int(
                                cluster.hours * 3600
                            ),
                            "template": {
                                "metadata": {"annotations": annotations},
                                "spec": {
                                    "restartPolicy": "Never",
                                    "nodeSelector": {
                                        "cloud.google.com/gke-tpu-accelerator":
                                            accelerator_label(cluster),
                                        "cloud.google.com/gke-tpu-topology":
                                            topo,
                                    },
                                    "volumes": volumes,
                                    "containers": [
                                        {
                                            "name": "rebel-tpu",
                                            "image": cluster.image,
                                            "workingDir": cluster.workdir,
                                            "command": list(command),
                                            "volumeMounts": mounts,
                                            "resources": {
                                                "limits": {
                                                    "google.com/tpu":
                                                        chips_per_host,
                                                },
                                            },
                                        }
                                    ],
                                },
                            },
                        },
                    },
                }
            ],
        },
    }
    return yaml.safe_dump(manifest, sort_keys=False)


def render_xpk_command(
    name: str, cluster: ClusterConfig, command: list[str]
) -> list[str]:
    cmd = [
        "xpk", "workload", "create",
        "--workload", name,
        "--cluster", cluster.cluster,
        "--tpu-type", cluster.tpu_type,
        "--num-slices", str(cluster.num_slices),
        "--docker-image", cluster.image,
        "--max-restarts", str(cluster.max_restarts),
        "--command", shlex.join(command),
    ]
    if cluster.project:
        cmd += ["--project", cluster.project]
    if cluster.zone:
        cmd += ["--zone", cluster.zone]
    return cmd


def render_gcloud_commands(
    name: str, cluster: ClusterConfig, command: list[str]
) -> list[list[str]]:
    """Plain Cloud-TPU-VM path: reserve the slice via queued-resources,
    then run the same command on every worker."""
    create = [
        "gcloud", "compute", "tpus", "queued-resources", "create", name,
        "--node-id", name,
        "--accelerator-type", cluster.tpu_type,
        "--runtime-version", cluster.runtime_version,
    ]
    if cluster.project:
        create += ["--project", cluster.project]
    if cluster.zone:
        create += ["--zone", cluster.zone]
    run = [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", name,
        "--worker=all", "--command", shlex.join(command),
    ]
    if cluster.project:
        run += ["--project", cluster.project]
    if cluster.zone:
        run += ["--zone", cluster.zone]
    return [create, run]


# ------------------------------------------------------------- actions
def _run(cmd: list[str], **kw) -> subprocess.CompletedProcess:
    log.info("cluster exec: %s", shlex.join(cmd))
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def submit(
    exp_dir: pathlib.Path,
    cluster: ClusterConfig,
    cfg_path: str,
    overrides: list[str],
) -> dict:
    """Render, persist, and (when the backend CLI exists) submit.

    Returns a record (also written to ``<exp_dir>/cluster.json`` — the
    ``heyhi.jobid`` analog) that ``status``/``cancel`` consume."""
    exp_dir = pathlib.Path(exp_dir)
    out = exp_dir / "cluster"
    out.mkdir(parents=True, exist_ok=True)
    name = job_name(exp_dir)
    command = child_command(str(exp_dir), cfg_path, overrides)
    record = {
        "backend": cluster.backend,
        "name": name,
        "namespace": cluster.namespace,
        # status/cancel need the same scoping flags submit used.
        "cluster": cluster.cluster,
        "project": cluster.project,
        "zone": cluster.zone,
        "submitted": False,
    }

    if cluster.backend == "gke":
        manifest = render_jobset(name, cluster, command)
        path = out / "jobset.yaml"
        path.write_text(manifest)
        record["manifest"] = str(path)
        cli = shutil.which("kubectl")
        if cli:
            proc = _run([cli, "apply", "-f", str(path)])
            record["submitted"] = proc.returncode == 0
            record["output"] = proc.stdout + proc.stderr
    elif cluster.backend == "xpk":
        cmd = render_xpk_command(name, cluster, command)
        (out / "xpk.sh").write_text(shlex.join(cmd) + "\n")
        record["command"] = cmd
        cli = shutil.which("xpk")
        if cli:
            proc = _run(cmd)
            record["submitted"] = proc.returncode == 0
            record["output"] = proc.stdout + proc.stderr
    elif cluster.backend == "gcloud":
        cmds = render_gcloud_commands(name, cluster, command)
        (out / "gcloud.sh").write_text(
            "\n".join(shlex.join(c) for c in cmds) + "\n"
        )
        record["commands"] = cmds
        cli = shutil.which("gcloud")
        if cli:
            # Queued-resources provisioning is async: only the
            # reservation can be issued here; the run command (gcloud.sh
            # line 2) must be executed once status() reports RUNNING
            # (i.e. the queued resource went ACTIVE).
            proc = _run(cmds[0])
            record["submitted"] = proc.returncode == 0
            record["output"] = proc.stdout + proc.stderr
            record["note"] = (
                "reservation only: run the second command in "
                "cluster/gcloud.sh once the queued resource is ACTIVE"
            )
            if record["submitted"]:
                log.info("%s", record["note"])
    else:
        raise ValueError(f"unknown cluster backend {cluster.backend!r}")

    if not record["submitted"]:
        log.info(
            "cluster backend '%s' CLI not on PATH (or submit failed); "
            "dry-run artifacts in %s", cluster.backend, out,
        )
    (exp_dir / "cluster.json").write_text(json.dumps(record, indent=1))
    return record


def status(exp_dir: pathlib.Path) -> str:
    """Job state (the squeue poll, heyhi/__init__.py:192-222):
    PENDING | RUNNING | SUCCEEDED | FAILED | UNKNOWN | NOT_SUBMITTED."""
    exp_dir = pathlib.Path(exp_dir)
    rec_path = exp_dir / "cluster.json"
    if not rec_path.exists():
        return "NOT_SUBMITTED"
    rec = json.loads(rec_path.read_text())
    if rec["backend"] == "gke":
        cli = shutil.which("kubectl")
        if not cli:
            return "UNKNOWN"
        proc = _run([
            cli, "get", "jobset", rec["name"],
            "-n", rec.get("namespace", "default"), "-o", "json",
        ])
        if proc.returncode != 0:
            return "UNKNOWN"
        conditions = json.loads(proc.stdout).get("status", {}).get(
            "conditions", []
        )
        state = {c.get("type"): c.get("status") for c in conditions}
        if state.get("Completed") == "True":
            return "SUCCEEDED"
        if state.get("Failed") == "True":
            return "FAILED"
        return "RUNNING" if conditions else "PENDING"
    if rec["backend"] == "xpk":
        cli = shutil.which("xpk")
        if not cli:
            return "UNKNOWN"
        cmd = [cli, "workload", "list", "--filter-by-job", rec["name"]]
        if rec.get("cluster"):
            cmd += ["--cluster", rec["cluster"]]
        if rec.get("project"):
            cmd += ["--project", rec["project"]]
        if rec.get("zone"):
            cmd += ["--zone", rec["zone"]]
        proc = _run(cmd)
        if proc.returncode != 0:
            return "UNKNOWN"
        for line in proc.stdout.splitlines():
            if rec["name"] in line:
                for s in ("Succeeded", "Failed", "Running", "Pending"):
                    if s in line:
                        return s.upper()
        return "UNKNOWN"
    if rec["backend"] == "gcloud":
        cli = shutil.which("gcloud")
        if not cli:
            return "UNKNOWN"
        cmd = [cli, "compute", "tpus", "queued-resources", "describe",
               rec["name"], "--format", "json"]
        if rec.get("project"):
            cmd += ["--project", rec["project"]]
        if rec.get("zone"):
            cmd += ["--zone", rec["zone"]]
        proc = _run(cmd)
        if proc.returncode != 0:
            return "UNKNOWN"
        st = json.loads(proc.stdout).get("state", {}).get("state", "")
        return {"ACTIVE": "RUNNING", "PROVISIONING": "PENDING",
                "WAITING_FOR_RESOURCES": "PENDING",
                "SUSPENDED": "FAILED"}.get(st, st or "UNKNOWN")
    return "UNKNOWN"


def cancel(exp_dir: pathlib.Path) -> bool:
    """The scancel analog (heyhi kill mode)."""
    exp_dir = pathlib.Path(exp_dir)
    rec_path = exp_dir / "cluster.json"
    if not rec_path.exists():
        return False
    rec = json.loads(rec_path.read_text())
    if rec["backend"] == "gke":
        cli = shutil.which("kubectl")
        if cli:
            return _run([
                cli, "delete", "jobset", rec["name"],
                "-n", rec.get("namespace", "default"),
            ]).returncode == 0
    elif rec["backend"] == "xpk":
        cli = shutil.which("xpk")
        if cli:
            cmd = [cli, "workload", "delete", "--workload", rec["name"]]
            if rec.get("cluster"):
                cmd += ["--cluster", rec["cluster"]]
            if rec.get("project"):
                cmd += ["--project", rec["project"]]
            if rec.get("zone"):
                cmd += ["--zone", rec["zone"]]
            return _run(cmd).returncode == 0
    elif rec["backend"] == "gcloud":
        cli = shutil.which("gcloud")
        if cli:
            cmd = [cli, "compute", "tpus", "queued-resources", "delete",
                   rec["name"], "--force", "--quiet"]
            if rec.get("project"):
                cmd += ["--project", rec["project"]]
            if rec.get("zone"):
                cmd += ["--zone", rec["zone"]]
            return _run(cmd).returncode == 0
    log.info("cluster backend CLI not available; nothing cancelled")
    return False


def config_from_dict(d: dict) -> ClusterConfig:
    known = {f.name for f in dataclasses.fields(ClusterConfig)}
    unknown = set(d) - known
    if unknown:
        raise ValueError(f"unknown cluster config keys: {sorted(unknown)}")
    return ClusterConfig(**d)
