"""rebel_tpu — a TPU-native (JAX/XLA) framework with the capabilities of
facebookresearch/rebel: ReBeL (Brown et al., NeurIPS 2020, arXiv:2007.13544)
for 2-player Liar's Dice.

Architecture (vs the reference's C++/libtorch design):

* game rules   -> precomputed device tables        (rebel_tpu.games)
* public trees -> static SoA topologies + masks    (rebel_tpu.tree)
* CFR/FP/BR    -> one jit'd tensor program, vmapped
                  over batches of subgames          (rebel_tpu.solving)
* value net    -> flax MLP fused into the solver   (rebel_tpu.nets)
* RL runner    -> lockstep batched episode engine  (rebel_tpu.selfplay)
* trainer      -> fused actor-learner on device    (rebel_tpu.training)
* eval         -> recursive solving harness        (rebel_tpu.eval)
"""

from rebel_tpu.games.liars_dice import INITIAL_ACTION, LiarsDice
from rebel_tpu.solving.params import SubgameSolvingParams
from rebel_tpu.tree import TreeSpec, build_supertree, root_action_mask, unroll_tree

__all__ = [
    "INITIAL_ACTION",
    "LiarsDice",
    "SubgameSolvingParams",
    "TreeSpec",
    "build_supertree",
    "root_action_mask",
    "unroll_tree",
]

__version__ = "0.1.0"
