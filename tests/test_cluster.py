"""Managed-cluster submission tests (rebel_tpu.parallel.cluster):
topology math, JobSet/xpk/gcloud rendering, and the submit/status/cancel
lifecycle against a fake kubectl — the heyhi/submitit Slurm role
(/root/reference/heyhi/__init__.py:361-406, 192-222) on GKE."""

import json
import os
import pathlib
import stat

import pytest
import yaml

from rebel_tpu.parallel import cluster as cl


def test_slice_shape_table():
    # (tpu_type, expected hosts, chips/host, topology)
    cases = [
        ("v5litepod-4", 1, 4, "2x2"),
        ("v5litepod-16", 4, 4, "4x4"),
        ("v5litepod-256", 64, 4, "16x16"),
        ("v6e-8", 2, 4, "2x4"),
        ("v4-8", 1, 4, "2x2x1"),      # 8 cores = 4 chips, one host
        ("v4-32", 4, 4, "2x2x4"),     # 16 chips over 4 hosts
        ("v5p-128", 16, 4, "4x4x4"),  # 64 chips over 16 hosts
    ]
    for tpu_type, hosts, chips, topo in cases:
        got = cl.slice_shape(cl.ClusterConfig(tpu_type=tpu_type))
        assert got == (hosts, chips, topo), (tpu_type, got)


def test_slice_shape_overrides_and_errors():
    cfg = cl.ClusterConfig(tpu_type="v5litepod-48", num_hosts=12,
                           topology="4x12")
    assert cl.slice_shape(cfg) == (12, 4, "4x12")
    with pytest.raises(ValueError, match="topology"):
        cl.slice_shape(cl.ClusterConfig(tpu_type="v5litepod-48"))
    with pytest.raises(ValueError, match="family"):
        cl.slice_shape(cl.ClusterConfig(tpu_type="h100-8"))


def test_render_jobset_manifest(tmp_path):
    cfg = cl.ClusterConfig(tpu_type="v5litepod-16", num_slices=2,
                           image="gcr.io/p/rebel:1", max_restarts=5)
    cmd = cl.child_command("/exp/d1", "conf/liars_sp.yaml",
                           ["env.num_faces=5"])
    manifest = yaml.safe_load(cl.render_jobset("rebel-d1", cfg, cmd))
    assert manifest["kind"] == "JobSet"
    spec = manifest["spec"]
    assert spec["failurePolicy"]["maxRestarts"] == 5
    (rj,) = spec["replicatedJobs"]
    assert rj["replicas"] == 2
    job = rj["template"]["spec"]
    assert job["parallelism"] == job["completions"] == 4  # 16 chips / 4
    pod = job["template"]["spec"]
    sel = pod["nodeSelector"]
    assert sel["cloud.google.com/gke-tpu-accelerator"] == \
        "tpu-v5-lite-podslice"
    assert sel["cloud.google.com/gke-tpu-topology"] == "4x4"
    (container,) = pod["containers"]
    assert container["resources"]["limits"]["google.com/tpu"] == 4
    # Resume-safe restart: pods always start in continue mode.
    assert "--mode" in container["command"]
    assert container["command"][
        container["command"].index("--mode") + 1] == "start_continue"
    assert "env.num_faces=5" in container["command"]


def test_render_xpk_and_gcloud():
    cfg = cl.ClusterConfig(backend="xpk", cluster="pod-a", project="p",
                           zone="us-east5-b", num_slices=4)
    cmd = cl.render_xpk_command("rebel-x", cfg, ["python", "run.py"])
    s = " ".join(cmd)
    assert "--num-slices 4" in s and "--cluster pod-a" in s
    assert "--command" in cmd

    create, run = cl.render_gcloud_commands("rebel-x", cfg,
                                            ["python", "run.py"])
    assert "queued-resources" in create and "--accelerator-type" in create
    assert "--worker=all" in run


def _fake_kubectl(bindir: pathlib.Path, get_json: dict) -> None:
    """Install a kubectl shim that logs argv and answers `get` with
    canned JSON."""
    log = bindir / "kubectl.log"
    script = bindir / "kubectl"
    script.write_text(
        "#!/bin/sh\n"
        f'echo "$@" >> {log}\n'
        'case "$1" in\n'
        f"  get) cat {bindir}/get.json ;;\n"
        "esac\n"
        "exit 0\n"
    )
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    (bindir / "get.json").write_text(json.dumps(get_json))


def test_submit_status_cancel_gke(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()
    _fake_kubectl(bindir, {
        "status": {"conditions": [{"type": "Completed", "status": "True"}]}
    })
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")

    exp = tmp_path / "outputs" / "My_Exp.01"
    cfg = cl.ClusterConfig(backend="gke", tpu_type="v5litepod-8")
    record = cl.submit(exp, cfg, "conf/liars_sp.yaml", ["seed=1"])
    assert record["submitted"] is True
    assert (exp / "cluster.json").exists()
    manifest = yaml.safe_load(pathlib.Path(record["manifest"]).read_text())
    assert manifest["metadata"]["name"] == record["name"]
    # RFC-1123: lowercase alphanumerics and dashes only.
    assert all(c.isalnum() or c == "-" for c in record["name"])
    assert record["name"] == record["name"].lower()

    assert cl.status(exp) == "SUCCEEDED"
    assert cl.cancel(exp) is True
    logged = (bindir / "kubectl.log").read_text()
    assert "apply -f" in logged and "delete jobset" in logged


def test_submit_dry_run_without_cli(tmp_path, monkeypatch):
    # Strip PATH so no backend CLI resolves: submit must degrade to a
    # dry run that still writes the artifacts.
    monkeypatch.setenv("PATH", str(tmp_path))
    exp = tmp_path / "exp"
    record = cl.submit(exp, cl.ClusterConfig(backend="gke"),
                       "conf/liars_sp.yaml", [])
    assert record["submitted"] is False
    assert pathlib.Path(record["manifest"]).exists()
    assert cl.status(exp) == "UNKNOWN"  # submitted record, no kubectl
    assert cl.cancel(exp) is False

    record = cl.submit(exp, cl.ClusterConfig(backend="xpk", cluster="c"),
                       "conf/liars_sp.yaml", [])
    assert record["submitted"] is False and (exp / "cluster" /
                                             "xpk.sh").exists()
    record = cl.submit(exp, cl.ClusterConfig(backend="gcloud"),
                       "conf/liars_sp.yaml", [])
    assert record["submitted"] is False and (exp / "cluster" /
                                             "gcloud.sh").exists()
    assert cl.status(tmp_path / "never") == "NOT_SUBMITTED"


def test_config_from_dict_rejects_unknown():
    with pytest.raises(ValueError, match="unknown cluster config"):
        cl.config_from_dict({"backend": "gke", "partition": "learnfair"})
    cfg = cl.config_from_dict({"backend": "xpk", "tpu_type": "v4-16"})
    assert cfg.tpu_type == "v4-16"


def test_jobset_shared_volume_and_name_hash(tmp_path):
    # gcs_bucket => GCS FUSE CSI volume mounted at workdir, pods run there.
    cfg = cl.ClusterConfig(tpu_type="v5litepod-4", gcs_bucket="ckpts",
                           workdir="/data")
    manifest = yaml.safe_load(
        cl.render_jobset("n", cfg, ["python", "run.py"])
    )
    pod = manifest["spec"]["replicatedJobs"][0]["template"]["spec"][
        "template"]
    assert pod["metadata"]["annotations"]["gke-gcsfuse/volumes"] == "true"
    (vol,) = pod["spec"]["volumes"]
    assert vol["csi"]["volumeAttributes"]["bucketName"] == "ckpts"
    (container,) = pod["spec"]["containers"]
    assert container["workingDir"] == "/data"
    assert container["volumeMounts"][0]["mountPath"] == "/data"
    # pvc variant
    cfg = cl.ClusterConfig(tpu_type="v5litepod-4", pvc="claim1")
    manifest = yaml.safe_load(
        cl.render_jobset("n", cfg, ["python", "run.py"])
    )
    (vol,) = manifest["spec"]["replicatedJobs"][0]["template"]["spec"][
        "template"]["spec"]["volumes"]
    assert vol["persistentVolumeClaim"]["claimName"] == "claim1"
    with pytest.raises(ValueError, match="not both"):
        cl.render_jobset(
            "n",
            cl.ClusterConfig(gcs_bucket="b", pvc="p"),
            ["python"],
        )
    # Same dir NAME under different parents must not collide (the
    # no-override exp dir is always named 'default').
    a = cl.job_name(tmp_path / "exp_a" / "default")
    b = cl.job_name(tmp_path / "exp_b" / "default")
    assert a != b and a.startswith("rebel-default-")


def test_record_scopes_status_and_cancel(tmp_path, monkeypatch):
    # gcloud status/cancel must reuse the project/zone submit used.
    bindir = tmp_path / "bin"
    bindir.mkdir()
    log = bindir / "gcloud.log"
    script = bindir / "gcloud"
    script.write_text(
        "#!/bin/sh\n"
        f'echo "$@" >> {log}\n'
        'case "$2" in esac\n'
        'echo \'{"state": {"state": "ACTIVE"}}\'\n'
        "exit 0\n"
    )
    script.chmod(0o755)
    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    exp = tmp_path / "exp"
    cfg = cl.ClusterConfig(backend="gcloud", project="proj-1",
                           zone="us-east5-b")
    record = cl.submit(exp, cfg, "conf/liars_sp.yaml", [])
    assert record["submitted"] and "reservation only" in record["note"]
    assert cl.status(exp) == "RUNNING"
    assert cl.cancel(exp) is True
    logged = log.read_text()
    for line in logged.splitlines():
        assert "--project proj-1" in line and "--zone us-east5-b" in line
