"""Counterfactual-value network.

Flax re-implementation of the reference ``Net2`` MLP
(/root/reference/cfvpy/models.py:64-94): input ``2 + num_actions +
2*num_hands`` -> ``n_layers`` x [Dense -> (LayerNorm) -> GELU ->
(Dropout)] with width ``n_hidden`` -> Dense head to ``num_hands`` whose
weights *and* bias are scaled by 0.01 at init so initial predictions are
near zero (models.py:88-91).

On TPU the forward runs in bfloat16 on the MXU with float32 params and
output (configurable); the reference runs float32 throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from rebel_tpu.games.liars_dice import LiarsDice


def _scaled_lecun(scale: float):
    base = nn.initializers.lecun_normal()

    def init(key, shape, dtype):
        return base(key, shape, dtype) * scale

    return init


class CFVNet(nn.Module):
    """MLP mapping a PBS query to per-hand counterfactual values."""

    num_hands: int
    n_hidden: int = 256
    n_layers: int = 2
    use_layer_norm: bool = True
    dropout: float = 0.0
    compute_dtype: Any = jnp.float32  # bfloat16 on TPU for the fast path

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        orig_dtype = x.dtype
        x = x.astype(self.compute_dtype)
        for _ in range(self.n_layers):
            x = nn.Dense(self.n_hidden, dtype=self.compute_dtype)(x)
            if self.use_layer_norm:
                # epsilon 1e-5 = torch nn.LayerNorm's default (flax
                # defaults to 1e-6) — required for numeric parity with
                # reference Net2 checkpoints exchanged via torch_import.
                x = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.compute_dtype
                )(x)
            # Exact (erf) GELU to match torch F.gelu (models.py:97-99).
            x = nn.gelu(x, approximate=False)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # Head init scaled by 0.01 (models.py:88-91).  The reference scales
        # torch's default (kaiming-uniform) init; the 0.01 factor is what
        # matters for near-zero initial predictions.
        x = nn.Dense(
            self.num_hands,
            dtype=self.compute_dtype,
            kernel_init=_scaled_lecun(0.01),
        )(x)
        return x.astype(orig_dtype)


@dataclasses.dataclass(frozen=True)
class CFVNetSpec:
    """Net + game binding: builds params and jit-friendly value fns."""

    game: LiarsDice
    n_hidden: int = 256
    n_layers: int = 2
    use_layer_norm: bool = True
    dropout: float = 0.0
    compute_dtype: Any = jnp.float32

    @property
    def module(self) -> CFVNet:
        return CFVNet(
            num_hands=self.game.num_hands,
            n_hidden=self.n_hidden,
            n_layers=self.n_layers,
            use_layer_norm=self.use_layer_norm,
            dropout=self.dropout,
            compute_dtype=self.compute_dtype,
        )

    def init_params(self, key: jax.Array):
        x = jnp.zeros((1, self.game.query_size), jnp.float32)
        return self.module.init(key, x)

    def value_fn(self, params):
        """Bind params -> a solver-consumable ``queries -> values`` fn."""
        module = self.module

        def fn(queries: jnp.ndarray) -> jnp.ndarray:
            return module.apply(params, queries)

        return fn
