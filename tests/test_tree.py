"""Tree tests ported from /root/reference/csrc/liars_dice/tree_test.cc,
plus supertree-mask invariants specific to the batched TPU formulation."""

import numpy as np

from rebel_tpu import INITIAL_ACTION, LiarsDice, build_supertree, unroll_tree
from rebel_tpu.tree import NO_CHILD, root_action_mask


def test_unroll_full_1d2():
    # tree_test.cc:20-34
    game = LiarsDice(num_dice=1, num_faces=2)
    tree = unroll_tree(game)
    assert tree.num_nodes == 31
    assert tree.children(0) == [1, 2, 3, 4]
    assert tree.children(1) == [5, 6, 7, 8]
    assert tree.children(2) == [9, 10, 11]
    assert tree.children(15) == [25, 26]
    assert tree.children(16) == [27]
    assert tree.children(25) == [30]


def test_unroll_depth_zero():
    # tree_test.cc:36-51
    game = LiarsDice(num_dice=2, num_faces=6)
    assert game.action_to_string(22) == "bid(quantity=4,face=4)"
    tree = unroll_tree(game, root_bid=22, root_player=0, max_depth=0)
    assert tree.num_nodes == 1
    assert tree.parent[0] == -1
    assert tree.children(0) == []
    assert tree.last_bid[0] == 22


def test_unroll_depth_one_two():
    # tree_test.cc:53-88
    game = LiarsDice(num_dice=2, num_faces=6)
    tree1 = unroll_tree(game, root_bid=22, max_depth=1)
    assert tree1.num_nodes == 3
    assert tree1.children(0) == [1, 2]
    assert tree1.parent[1] == 0 and tree1.parent[2] == 0

    tree2 = unroll_tree(game, root_bid=22, max_depth=2)
    assert tree2.num_nodes == 4
    assert tree2.children(0) == [1, 2]
    assert tree2.parent[3] == 1

    # tree_test.cc:90-105
    assert game.action_to_string(21) == "bid(quantity=4,face=3)"
    tree3 = unroll_tree(game, root_bid=21, max_depth=2)
    assert tree3.num_nodes == 7
    assert tree3.children(0) == [1, 2, 3]
    assert tree3.children(1) == [4, 5]
    assert tree3.children(2) == [6]


def test_tree_is_breadth_first():
    # tree_test.cc:107-125 — shallower unrolls are prefixes of deeper ones.
    game = LiarsDice(num_dice=1, num_faces=5)
    full = unroll_tree(game)
    for d in range(12):
        sub = unroll_tree(game, max_depth=d)
        n = sub.num_nodes
        np.testing.assert_array_equal(full.last_bid[:n], sub.last_bid)
        np.testing.assert_array_equal(full.depth[:n], sub.depth)
        interior = sub.num_children > 0
        np.testing.assert_array_equal(
            full.children_begin[:n][interior], sub.children_begin[interior]
        )
        np.testing.assert_array_equal(
            full.num_children[:n][interior], sub.num_children[interior]
        )
        np.testing.assert_array_equal(full.parent[:n], sub.parent)


def test_levels_contiguous():
    game = LiarsDice(num_dice=1, num_faces=4)
    tree = unroll_tree(game)
    assert tree.num_nodes == 2 ** game.num_actions - 1
    starts = [s for s, _ in tree.level_slices]
    assert starts[0] == 0
    ends = [e for _, e in tree.level_slices]
    assert ends[-1] == tree.num_nodes
    for (s0, e0), (s1, e1) in zip(tree.level_slices, tree.level_slices[1:]):
        assert e0 == s1


def test_child_index_consistency():
    game = LiarsDice(num_dice=1, num_faces=4)
    tree = unroll_tree(game, max_depth=3)
    for n in range(tree.num_nodes):
        lo = int(tree.first_action[n])
        for k, c in enumerate(tree.children(n)):
            a = lo + k
            assert tree.child_index[n, a] == c
            assert tree.action_mask[n, a]
            assert tree.last_bid[c] == a
            assert tree.parent[c] == n
        # Everything outside the child range is masked.
        valid = np.zeros(game.num_actions, bool)
        valid[lo : lo + int(tree.num_children[n])] = True
        np.testing.assert_array_equal(tree.action_mask[n], valid)
        assert np.all(tree.child_index[n][~valid] == NO_CHILD)


def test_supertree_covers_concrete_roots():
    """A concrete subgame is the supertree restricted by the root mask:
    level-1 nodes with masked actions match the concrete tree's children
    one-to-one by action id, and their subtrees are topology-identical."""
    game = LiarsDice(num_dice=1, num_faces=4)
    sup = build_supertree(game, max_depth=2)
    assert sup.num_children[0] == game.num_actions

    for root_bid in [INITIAL_ACTION, 0, 3, game.num_actions - 2]:
        mask = root_action_mask(game, root_bid)
        lo, hi = game.bid_range(root_bid)
        expect = np.zeros(game.num_actions, bool)
        expect[lo:hi] = True
        np.testing.assert_array_equal(np.asarray(mask), expect)

        conc = unroll_tree(game, root_bid=root_bid, max_depth=2)
        for a in range(lo, hi):
            s1 = int(sup.child_index[0, a])
            c1 = int(conc.child_index[0, a])
            assert sup.last_bid[s1] == conc.last_bid[c1] == a
            assert sup.num_children[s1] == conc.num_children[c1]
            assert bool(sup.is_terminal[s1]) == bool(conc.is_terminal[c1])
            # Level-2 children match action-by-action.
            for a2 in range(game.num_actions):
                s2 = int(sup.child_index[s1, a2])
                c2 = int(conc.child_index[c1, a2])
                assert (s2 == NO_CHILD) == (c2 == NO_CHILD)
                if s2 != NO_CHILD:
                    assert sup.last_bid[s2] == conc.last_bid[c2] == a2


def test_supertree_anc1_and_validity():
    game = LiarsDice(num_dice=1, num_faces=4)
    sup = build_supertree(game, max_depth=2)
    # anc1_action identifies the level-1 ancestor's action.
    for n in range(1, sup.num_nodes):
        p = n
        while sup.parent[p] != 0:
            p = int(sup.parent[p])
        assert sup.anc1_action[n] == sup.last_bid[p]
    # Terminal/pseudo-leaf classification.
    assert np.all(sup.last_bid[sup.terminal_ids] == game.liar_call)
    pl = sup.pseudo_leaf_ids
    assert np.all(sup.last_bid[pl] != game.liar_call)
    assert np.all(sup.depth[pl] == 2)
