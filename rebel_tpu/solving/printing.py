"""Human-readable strategy printing (print_strategy,
/root/reference/csrc/liars_dice/subgame_solving.cc:732-763): one line per
interior node with the per-hand action distributions at 2 decimal
places."""

from __future__ import annotations

import sys

import numpy as np

from rebel_tpu.games.liars_dice import LiarsDice
from rebel_tpu.tree import TreeSpec


def print_strategy(
    game: LiarsDice,
    tree: TreeSpec,
    strategy,
    stream=None,
) -> None:
    out = stream or sys.stdout
    s = np.asarray(strategy)
    assert s.shape[0] == tree.num_nodes
    out.write("Printing strategies per node\n")
    for node_id in range(tree.num_nodes):
        if tree.num_children[node_id] == 0:
            continue
        state = game.state_to_string(
            int(tree.last_bid[node_id]), tree.node_player(node_id)
        )
        out.write(f"Node={node_id}\t{state}")
        for hand in range(s.shape[1]):
            out.write(f"| hand={hand} ")
            out.write(" ".join(f"{v:.2f}" for v in s[node_id][hand]) + " ")
        out.write("\n")


def print_strategy_to_file(game, tree, strategy, path: str) -> None:
    with open(path, "w") as f:
        print_strategy(game, tree, strategy, f)
