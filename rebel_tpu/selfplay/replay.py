"""Device-resident replay buffer for (query, value) training examples.

TPU-first re-design of ``PrioritizedReplay<ValueTransition>``
(/root/reference/csrc/liars_dice/rela/prioritized_replay.h).  The
reference is a mutex+condvar ring of torch tensors fed by actor threads;
here the buffer is a NamedTuple of preallocated device arrays donated
through jit'd ``add``/``sample`` steps, so generation -> replay -> learner
never leaves the device.

Semantics kept from the reference:

* priorities stored as ``priority ** alpha`` at add time
  (prioritized_replay.h:247-252);
* prioritized sampling is stratified: batch segment ``sum/B``, one
  uniform draw per segment, inverted through the priority cumsum
  (prioritized_replay.h:374-449); importance weights
  ``(N * w / sum) ** -beta / max`` (prioritized_replay.h:439-441);
* uniform mode (``use_priority=False``, the trained configuration,
  conf/c02_selfplay/liars_sp.yaml:43) samples indices uniformly;
* ``num_add`` counts all appended rows (drives the train/gen throttle,
  cfvpy/selfplay.py:391-405);
* ring keeps the newest ``capacity`` rows (the reference pops oldest
  at sample time, prioritized_replay.h:429-433 — same steady state);
* disk dump/load in the reference's exact binary format
  ``[int32 qsize][int32 vsize][qsize f32][vsize f32]`` per row
  (rela/types.cc:87-111).
"""

from __future__ import annotations

import struct
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Replay(NamedTuple):
    queries: jnp.ndarray  # [C, Q] f32
    values: jnp.ndarray  # [C, H] f32
    priorities: jnp.ndarray  # [C] f32 (already ** alpha)
    head: jnp.ndarray  # i32: next write slot
    size: jnp.ndarray  # i32: valid rows
    num_add: jnp.ndarray  # i32: lifetime appended rows

    @property
    def capacity(self) -> int:
        return self.queries.shape[0]


def create(capacity: int, query_size: int, num_hands: int) -> Replay:
    return Replay(
        queries=jnp.zeros((capacity, query_size), jnp.float32),
        values=jnp.zeros((capacity, num_hands), jnp.float32),
        priorities=jnp.zeros((capacity,), jnp.float32),
        head=jnp.int32(0),
        size=jnp.int32(0),
        num_add=jnp.zeros((), jnp.int32),
    )


def add(
    replay: Replay,
    queries: jnp.ndarray,  # [K, Q]
    values: jnp.ndarray,  # [K, H]
    priority: jnp.ndarray | float = 1.0,
    alpha: float = 1.0,
) -> Replay:
    """Append K rows, overwriting the oldest beyond capacity.  Actors push
    with priority 1 (rela/data_loop.h:50-55)."""
    K = queries.shape[0]
    C = replay.capacity
    if K > C:
        # Keep only the newest C rows (the reference's steady state).
        # Without this, the scatter below would carry duplicate indices
        # whose application order XLA leaves implementation-defined —
        # fine on CPU, not guaranteed on TPU.
        queries = queries[-C:]
        values = values[-C:]
        num_dropped = K - C
        K = C
    else:
        num_dropped = 0
    prio = jnp.broadcast_to(
        jnp.asarray(priority, jnp.float32), (K,)
    ) ** jnp.float32(alpha)
    idx = (replay.head + jnp.arange(K, dtype=jnp.int32)) % C
    return Replay(
        queries=replay.queries.at[idx].set(queries.astype(jnp.float32)),
        values=replay.values.at[idx].set(values.astype(jnp.float32)),
        priorities=replay.priorities.at[idx].set(prio),
        head=(replay.head + K) % C,
        size=jnp.minimum(replay.size + K, C),
        num_add=replay.num_add + K + num_dropped,
    )


class Sample(NamedTuple):
    queries: jnp.ndarray  # [B, Q]
    values: jnp.ndarray  # [B, H]
    weights: jnp.ndarray  # [B] importance weights (1.0 in uniform mode)
    indices: jnp.ndarray  # [B] buffer slots (for update_priority)


def _valid_mask(replay: Replay) -> jnp.ndarray:
    C = replay.capacity
    slot = jnp.arange(C, dtype=jnp.int32)
    # Valid slots are the `size` most recently written positions.
    age = (replay.head - 1 - slot) % C  # 0 = newest
    return age < replay.size


def sample_uniform(replay: Replay, key: jax.Array, batch: int) -> Sample:
    """Uniform sampling over valid rows (prioritized_replay.h:451-486)."""
    C = replay.capacity
    # Draw offsets in [0, size) over the newest `size` slots.
    off = jax.random.randint(key, (batch,), 0, jnp.maximum(replay.size, 1))
    idx = (replay.head - 1 - off) % C
    return Sample(
        queries=replay.queries[idx],
        values=replay.values[idx],
        # Weight 0 on an empty buffer so a premature sample (before
        # burn-in) zeroes the loss instead of training on blank rows.
        weights=jnp.where(
            replay.size > 0, 1.0, 0.0
        ) * jnp.ones((batch,), jnp.float32),
        indices=idx,
    )


def sample_prioritized(
    replay: Replay, key: jax.Array, batch: int, beta: float
) -> Sample:
    """Stratified priority sampling (prioritized_replay.h:374-449)."""
    C = replay.capacity
    valid = _valid_mask(replay)
    w = jnp.where(valid, replay.priorities, 0.0)
    cum = jnp.cumsum(w)
    total = cum[-1]
    segment = total / batch
    u = jax.random.uniform(key, (batch,), maxval=1.0)
    targets = (jnp.arange(batch) + u) * segment
    targets = jnp.minimum(targets, total * (1 - 1e-7))
    idx = jnp.searchsorted(cum, targets, side="right").astype(jnp.int32)
    idx = jnp.minimum(idx, C - 1)
    wi = w[idx]
    size_f = replay.size.astype(jnp.float32)
    iw = (size_f * wi / jnp.maximum(total, 1e-30)) ** (-beta)
    # wi == 0 (empty buffer, or a zero-priority slot hit at the cumsum
    # boundary) gives 0**-beta = inf -> NaN after normalization; such
    # rows carry no probability mass in the reference sampler, so zero
    # their weight instead.
    iw = jnp.where(wi > 0, iw, 0.0)
    iw = iw / jnp.maximum(iw.max(), 1e-30)
    return Sample(
        queries=replay.queries[idx],
        values=replay.values[idx],
        weights=iw,
        indices=idx,
    )


def update_priority(
    replay: Replay, indices: jnp.ndarray, priority: jnp.ndarray,
    alpha: float = 1.0,
) -> Replay:
    """updatePriority (prioritized_replay.h:298-313)."""
    prio = priority.astype(jnp.float32) ** jnp.float32(alpha)
    return replay._replace(priorities=replay.priorities.at[indices].set(prio))


def pop_until(replay: Replay, new_size) -> Replay:
    """Drop oldest rows until ``size <= new_size`` (popUntil,
    prioritized_replay.h:356-361)."""
    return replay._replace(size=jnp.minimum(replay.size, jnp.int32(new_size)))


# ------------------------------------------------------------------ disk
def extract(replay: Replay) -> tuple[np.ndarray, np.ndarray]:
    """Host copy of valid rows, oldest first (extract,
    prioritized_replay.h:338-347)."""
    C = replay.capacity
    size = int(replay.size)
    head = int(replay.head)
    order = (head - size + np.arange(size)) % C
    return (
        np.asarray(replay.queries)[order],
        np.asarray(replay.values)[order],
    )


def save(replay: Replay, path: str, stride: int = 1) -> int:
    """Reference-compatible binary dump (rela/types.cc:87-94;
    save with stride, prioritized_replay.h:319-327)."""
    q, v = extract(replay)
    q, v = q[::stride], v[::stride]
    n, qsize, vsize = q.shape[0], q.shape[1], v.shape[1]
    # One structured array -> one write (a per-row Python loop takes
    # minutes at production capacities, blocking the epoch loop).
    rec = np.zeros(
        n,
        dtype=[
            ("qsize", "<i4"), ("vsize", "<i4"),
            ("q", "<f4", (qsize,)), ("v", "<f4", (vsize,)),
        ],
    )
    rec["qsize"] = qsize
    rec["vsize"] = vsize
    rec["q"] = q
    rec["v"] = v
    with open(path, "wb") as f:
        f.write(rec.tobytes())
    return n


def load_file(path: str, max_size: int | None = None, stride: int = 1):
    """Read a reference-format dataset (rela/types.cc:96-111) into
    (queries, values) numpy arrays."""
    qs, vs = [], []
    with open(path, "rb") as f:
        i = 0
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            qsize, vsize = struct.unpack("ii", hdr)
            q = np.frombuffer(f.read(4 * qsize), "<f4")
            v = np.frombuffer(f.read(4 * vsize), "<f4")
            if i % stride == 0:
                qs.append(q)
                vs.append(v)
            i += 1
            if max_size is not None and len(qs) >= max_size:
                break
    if not qs:
        raise ValueError(
            f"dataset dump {path!r} contains no rows (empty or "
            "truncated before the first record)"
        )
    return np.stack(qs), np.stack(vs)


def load_into(replay: Replay, path: str, priority: float = 1.0,
              alpha: float = 1.0, max_size: int | None = None,
              stride: int = 1) -> Replay:
    """Preload a dataset dump into the buffer (replay.load,
    prioritized_replay.h:329-335; used by cfvpy/selfplay.py:613-621)."""
    q, v = load_file(path, max_size=max_size, stride=stride)
    return add(replay, jnp.asarray(q), jnp.asarray(v), priority, alpha)


# ------------------------------------------------------------ compression
def quantize(values: jnp.ndarray) -> jnp.ndarray:
    """Byte-quantize values in [0, 1] (rela/types.h:30-33; unused by the
    trained config but kept for parity)."""
    return jnp.clip(values * 255 + 0.5, 0.0, 255.5).astype(jnp.uint8)


def dequantize(values: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`quantize` (rela/types.h:35-37)."""
    return values.astype(jnp.float32) / 255.0
