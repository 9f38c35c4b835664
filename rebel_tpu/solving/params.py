"""Solver hyper-parameters, mirroring ``SubgameSolvingParams``
(/root/reference/csrc/liars_dice/subgame_solving.h:43-58)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SubgameSolvingParams:
    # Common FP/CFR params.
    num_iters: int = 10
    max_depth: int = 2
    linear_update: bool = False
    use_cfr: bool = False  # False => fictitious play.

    # FP-only.
    optimistic: bool = False

    # CFR-only (discounted CFR).
    dcfr: bool = False
    dcfr_alpha: float = 0.0
    dcfr_beta: float = 0.0
    dcfr_gamma: float = 0.0

    def __post_init__(self):
        if self.use_cfr:
            assert not (self.linear_update and self.dcfr), (
                "linear_update and dcfr are mutually exclusive "
                "(subgame_solving.cc:533)"
            )

    def replace(self, **kw) -> "SubgameSolvingParams":
        return dataclasses.replace(self, **kw)
