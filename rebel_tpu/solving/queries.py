"""Value-net query (de)serialization.

The query layout is the training interchange format and must match the
reference bit-for-bit in meaning
(/root/reference/csrc/liars_dice/subgame_solving.cc:100-123, 910-929):

    [ node_player, traverser, one_hot(last_bid) over num_actions,
      normalize_safe(reach_player0), normalize_safe(reach_player1) ]

size ``2 + num_actions + 2 * num_hands``.  A terminal state is never
queried (the one-hot may therefore never be the liar call).
"""

from __future__ import annotations

import numpy as np

from rebel_tpu.games.liars_dice import LiarsDice
from rebel_tpu.solving.core import REACH_EPS_F64


def get_query(
    game: LiarsDice,
    traverser: int,
    last_bid: int,
    player_id: int,
    reaches1,
    reaches2,
    eps: float = REACH_EPS_F64,
) -> np.ndarray:
    """Host-side query encoder (get_query, subgame_solving.cc:901-908)."""
    assert last_bid != game.liar_call, "never query a terminal"
    r1 = np.asarray(reaches1, np.float64) + eps
    r2 = np.asarray(reaches2, np.float64) + eps
    onehot = (np.arange(game.num_actions) == last_bid).astype(np.float64)
    return np.concatenate(
        [
            [float(player_id), float(traverser)],
            onehot,
            r1 / r1.sum(),
            r2 / r2.sum(),
        ]
    ).astype(np.float32)


def deserialize_query(game: LiarsDice, query) -> tuple[int, int, int, np.ndarray, np.ndarray]:
    """Inverse of :func:`get_query` (deserialize_query,
    subgame_solving.cc:910-929).  Returns
    ``(traverser, last_bid, player_id, beliefs0, beliefs1)``."""
    q = np.asarray(query, np.float64)
    A, H = game.num_actions, game.num_hands
    player_id = int(q[0] + 0.5)
    traverser = int(q[1] + 0.5)
    onehot = q[2 : 2 + A]
    last_bid = -1
    for a in range(A):
        if onehot[a] > 0.5:
            last_bid = a
    beliefs0 = q[2 + A : 2 + A + H].copy()
    beliefs1 = q[2 + A + H : 2 + A + 2 * H].copy()
    return traverser, last_bid, player_id, beliefs0, beliefs1
