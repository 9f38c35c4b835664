"""Liar's Dice game descriptor.

TPU-first re-design of the reference game core
(/root/reference/csrc/liars_dice/liars_dice.h:46-155): instead of per-call
scalar rule evaluation, all game logic is precomputed into small dense
tables (match counts, terminal payoffs, action unpacking) that live as
device constants inside jit'd programs. Game rules then become table
lookups / masked tensor ops.

Rules (2-player Liar's Dice):
  * Each player privately rolls ``num_dice`` dice with ``num_faces`` faces.
  * Actions are bids ``(quantity, face)`` packed as
    ``action = (quantity - 1) * num_faces + face`` plus a final "liar" call
    (action id ``num_actions - 1``).
  * Bids must strictly increase in packed order; "liar" is allowed after
    any bid (but not as the opening action).
  * The highest face is wild: it matches every face.
  * After a "liar" call the game ends: the bid ``(q, f)`` is *valid* iff the
    total number of dice matching ``f`` (or wild) across both hands is at
    least ``q``; the liar-caller loses iff the bid was valid.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

# Action encoding for "no bid yet" (root of the full game).
INITIAL_ACTION = -1


@dataclasses.dataclass(frozen=True)
class LiarsDice:
    """Immutable game descriptor with precomputed numpy tables.

    Mirrors the public interface of the reference ``Game`` class
    (/root/reference/csrc/liars_dice/liars_dice.h:46-134) but exposes the
    rules as arrays suitable for XLA constant-folding.
    """

    num_dice: int
    num_faces: int

    # ------------------------------------------------------------------ sizes
    @property
    def total_num_dice(self) -> int:
        return 2 * self.num_dice

    @property
    def num_actions(self) -> int:
        return 1 + self.total_num_dice * self.num_faces

    @property
    def num_hands(self) -> int:
        return self.num_faces**self.num_dice

    @property
    def liar_call(self) -> int:
        return self.num_actions - 1

    @property
    def wild_face(self) -> int:
        return self.num_faces - 1

    @property
    def max_depth(self) -> int:
        """Upper bound on game-tree depth (liars_dice.h:72)."""
        return 1 + self.num_actions

    @property
    def query_size(self) -> int:
        """Value-net query width (subgame_solving.cc:100-102)."""
        return 2 + self.num_actions + 2 * self.num_hands

    # ---------------------------------------------------------------- actions
    def unpack_action(self, action: int) -> tuple[int, int]:
        """(quantity, face) of a bid action (liars_dice.h:74-80)."""
        assert 0 <= action < self.liar_call
        return 1 + action // self.num_faces, action % self.num_faces

    def bid_range(self, last_bid: int) -> tuple[int, int]:
        """Legal actions as ``[lo, hi)`` given the previous bid.

        The opening move may not be a liar call; any later move may
        (liars_dice.h:110-115).
        """
        if last_bid == INITIAL_ACTION:
            return 0, self.num_actions - 1
        return last_bid + 1, self.num_actions

    def is_terminal(self, last_bid: int) -> bool:
        return last_bid == self.liar_call

    # ----------------------------------------------------------------- tables
    @functools.cached_property
    def matches_table(self) -> np.ndarray:
        """``[num_hands, num_faces]`` — dice in hand matching face-or-wild.

        Hand ``h`` encodes dice base-``num_faces``
        (liars_dice.h:83-91).
        """
        out = np.zeros((self.num_hands, self.num_faces), dtype=np.int32)
        for hand in range(self.num_hands):
            dice = self.hand_to_dice(hand)
            for f in range(self.num_faces):
                out[hand, f] = sum(
                    1 for d in dice if d == f or d == self.wild_face
                )
        return out

    def num_matches(self, hand: int, face: int) -> int:
        return int(self.matches_table[hand, face])

    @functools.cached_property
    def terminal_payoff(self) -> np.ndarray:
        """``[num_actions - 1, num_hands, num_hands]`` payoff tensor.

        ``terminal_payoff[bid, h, o] = +1`` if bid ``(q, f)`` is valid when
        the bidder holds ``h`` and the challenger holds ``o`` (bidder wins),
        else ``-1``.  The sign convention matches
        ``compute_expected_terminal_values``
        (/root/reference/csrc/liars_dice/subgame_solving.cc:80-98): values
        are from the perspective of the *player to act at the terminal*,
        which is the player who made the challenged bid.
        """
        A, H = self.num_actions, self.num_hands
        payoff = np.zeros((A - 1, H, H), dtype=np.float64)
        m = self.matches_table  # [H, F]
        for bid in range(A - 1):
            q, f = self.unpack_action(bid)
            valid = (m[:, f][:, None] + m[:, f][None, :]) >= q  # [h, o]
            payoff[bid] = np.where(valid, 1.0, -1.0)
        return payoff

    # ------------------------------------------------------------- formatting
    def action_to_string(self, action: int) -> str:
        """Pretty-print an action (liars_dice.cc:21-33)."""
        if action == INITIAL_ACTION:
            return "(initial)"
        if action == self.liar_call:
            return "liar"
        q, f = self.unpack_action(action)
        return f"bid(quantity={q},face={f})"

    def state_to_string(self, last_bid: int, player_id: int) -> str:
        return f"(pid={player_id},last={self.action_to_string(last_bid)})"

    def hand_to_dice(self, hand: int) -> list[int]:
        dice = []
        h = hand
        for _ in range(self.num_dice):
            dice.append(h % self.num_faces)
            h //= self.num_faces
        return dice
