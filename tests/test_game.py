"""Game-rule tests ported from the reference gtest suite
(/root/reference/csrc/liars_dice/liars_dice_test.cc) on a 2-dice 6-face
game, plus table-consistency checks specific to the array formulation."""

import numpy as np
import pytest

from rebel_tpu import INITIAL_ACTION, LiarsDice


@pytest.fixture
def game():
    return LiarsDice(num_dice=2, num_faces=6)


def test_unpack(game):
    # liars_dice_test.cc:46-62
    assert game.unpack_action(0) == (1, 0)
    assert game.unpack_action(1) == (1, 1)
    assert game.unpack_action(6) == (2, 0)


def test_root_bid_ranges(game):
    # liars_dice_test.cc:64-94
    assert game.bid_range(INITIAL_ACTION) == (0, 4 * 6)
    assert game.bid_range(0) == (1, 4 * 6 + 1)
    assert game.bid_range(11) == (12, 4 * 6 + 1)
    # After a liar call the range is empty.
    lo, hi = game.bid_range(game.liar_call)
    assert lo == hi == 4 * 6 + 1
    assert game.is_terminal(game.liar_call)
    assert not game.is_terminal(0)


def test_player_alternation(game):
    # liars_dice_test.cc:96-102 — players alternate; with our depth-parity
    # convention the actor after k actions from the root is k % 2 flipped.
    player = 0
    for _ in range(4 * 6 + 1):
        player = 1 - player
    assert player == 1  # odd number of actions from player 0


def test_num_matches_simple(game):
    # liars_dice_test.cc:104-108 — hand 0 = two 1's.
    np.testing.assert_array_equal(
        game.matches_table[0], np.array([2, 0, 0, 0, 0, 0])
    )


def test_num_matches_wild(game):
    # liars_dice_test.cc:110-115 — hand of two wilds matches everything.
    assert game.wild_face == 5
    np.testing.assert_array_equal(
        game.matches_table[game.num_hands - 1], np.array([2] * 6)
    )


def test_num_matches_semi_wild(game):
    # liars_dice_test.cc:117-121 — hand (1, 6): die 0 face 5 (wild), die 1
    # face 0.  Encoded hand = 0*6 + 5.
    np.testing.assert_array_equal(
        game.matches_table[0 * 6 + 5], np.array([2, 1, 1, 1, 1, 1])
    )


def test_sizes(game):
    assert game.num_actions == 1 + 4 * 6
    assert game.num_hands == 36
    assert game.liar_call == 24
    assert game.query_size == 2 + game.num_actions + 2 * game.num_hands


def test_terminal_payoff_tensor():
    game = LiarsDice(num_dice=1, num_faces=2)
    payoff = game.terminal_payoff  # [A-1, H, H]
    assert payoff.shape == (game.num_actions - 1, 2, 2)
    # bid 0 = (q=1, f=0): valid iff either hand shows face 0 or wild(=1).
    # Every hand matches (face 0 matches, face 1 is wild) => always valid.
    np.testing.assert_array_equal(payoff[0], np.ones((2, 2)))
    # bid 3 = (q=2, f=1): need two wilds total.
    q, f = game.unpack_action(3)
    assert (q, f) == (2, 1)
    expect = np.array([[-1.0, -1.0], [-1.0, 1.0]])
    np.testing.assert_array_equal(payoff[3], expect)
