"""Native host-store + reference-RNG tests (csrc/)."""

import pathlib

import numpy as np
import pytest

from rebel_tpu.selfplay.host_store import HostReplayStore, ReferenceRng
from rebel_tpu.selfplay import replay as rb


def test_host_store_roundtrip(tmp_path):
    store = HostReplayStore(query_size=3, num_hands=2)
    q = np.arange(12, dtype=np.float32).reshape(4, 3)
    v = np.arange(8, dtype=np.float32).reshape(4, 2)
    store.append(q, v)
    store.append(q + 100, v + 100)
    assert len(store) == 8
    q2, v2 = store.read(2, 4)
    np.testing.assert_array_equal(q2[:2], q[2:])
    np.testing.assert_array_equal(q2[2:], q[:2] + 100)

    path = tmp_path / "dump.bin"
    assert store.save(path) == 8
    # Interop: the device-replay loader reads the C++ store's dump.
    qs, vs = rb.load_file(str(path))
    np.testing.assert_array_equal(qs[:4], q)
    np.testing.assert_array_equal(vs[4:], v + 100)
    # And the C++ store reads the python writer's dump.
    r = rb.create(capacity=8, query_size=3, num_hands=2)
    import jax.numpy as jnp

    r = rb.add(r, jnp.asarray(q), jnp.asarray(v))
    rb.save(r, str(tmp_path / "py.bin"))
    store2 = HostReplayStore(query_size=3, num_hands=2)
    assert store2.load(str(tmp_path / "py.bin")) == 4
    q3, _ = store2.read(0, 4)
    np.testing.assert_array_equal(q3, q)

    with pytest.raises(IOError):
        HostReplayStore(query_size=5, num_hands=2).load(str(path))


def test_reference_rng_matches_cpp_semantics():
    """Same seed => identical stream across instances (and the raw output
    matches numpy's MT19937, which implements the same generator)."""
    a = ReferenceRng(1234)
    b = ReferenceRng(1234)
    seq_a = [a.uniform_int(0, 1024) for _ in range(10)]
    seq_b = [b.uniform_int(0, 1024) for _ in range(10)]
    assert seq_a == seq_b

    c = ReferenceRng(7)
    rng = np.random.Generator(np.random.MT19937(7))
    # numpy's MT19937 seeding differs from std::mt19937 for the same
    # integer; only check the raw generator identity with an explicit
    # state match is out of scope — instead verify std::mt19937's
    # well-known 10000th output for seed 5489 (default C++ seed).
    d = ReferenceRng(5489)
    out = None
    for _ in range(10000):
        out = d.raw()
    assert out == 4123659995  # documented std::mt19937 value


def test_reference_rng_discrete():
    r = ReferenceRng(0)
    counts = np.zeros(3)
    for _ in range(3000):
        counts[r.discrete([0.2, 0.3, 0.5])] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.2, 0.3, 0.5], atol=0.04)


def test_store_tsan_concurrent():
    """Data-race check on the threaded host store: build the TSAN stress
    driver (csrc/store_tsan_test.cc) and require a clean run. The
    reference has no sanitizer coverage (SURVEY §5)."""
    import shutil
    import subprocess

    csrc = pathlib.Path(__file__).resolve().parents[1] / "csrc"
    if shutil.which("g++") is None:
        pytest.skip("no g++")
    build = subprocess.run(
        ["make", "-C", str(csrc), "tsan"], capture_output=True, text=True
    )
    if build.returncode != 0:
        pytest.skip(f"tsan build unavailable: {build.stderr[-200:]}")
    run = subprocess.run(
        [str(csrc / "store_tsan_test")], capture_output=True, text=True
    )
    assert run.returncode == 0, run.stderr
    assert "ThreadSanitizer" not in run.stderr, run.stderr
