"""Import reference PyTorch checkpoints into CFVNet params.

The reference releases ``Net2`` state-dict checkpoints
(/root/reference/cfvpy/models.py:64-94, downloaded by
scripts/eval_all.py:38-44) and exports TorchScript for its C++ eval.
This module maps a ``Net2`` state dict onto the flax :class:`CFVNet`
parameter tree so reference-trained models can be evaluated inside this
framework.

Layout correspondence (use_layer_norm=True, dropout=0):

    torch ``body.{4k+0}`` Linear     -> flax ``Dense_k`` (kernel = W.T)
    torch ``body.{4k+1}`` LayerNorm  -> flax ``LayerNorm_k``
    torch ``output``      Linear     -> flax ``Dense_{n_layers}``
"""

from __future__ import annotations

import numpy as np

from rebel_tpu.games.liars_dice import LiarsDice
from rebel_tpu.nets.cfv_net import CFVNetSpec


def net2_state_dict_to_params(
    state_dict: dict, spec: CFVNetSpec
) -> dict:
    """Build a flax params pytree from a torch ``Net2`` state dict."""
    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }
    stride = 4  # [Linear, norm, act, dropout] per layer (models.py:41-49)
    params: dict = {}
    for k in range(spec.n_layers):
        w = sd[f"body.{stride * k}.weight"]
        b = sd[f"body.{stride * k}.bias"]
        params[f"Dense_{k}"] = {"kernel": w.T, "bias": b}
        if spec.use_layer_norm:
            params[f"LayerNorm_{k}"] = {
                "scale": sd[f"body.{stride * k + 1}.weight"],
                "bias": sd[f"body.{stride * k + 1}.bias"],
            }
    params[f"Dense_{spec.n_layers}"] = {
        "kernel": sd["output.weight"].T,
        "bias": sd["output.bias"],
    }
    return {"params": params}


def load_net2_checkpoint(path: str, game: LiarsDice, **spec_kwargs):
    """Load a reference checkpoint into (CFVNetSpec, params).

    Accepts both release formats: plain ``torch.save`` state dicts
    (scripts/eval_all.py:38-44) and TorchScript archives (the
    ``torch.jit.save`` exports consumed by the C++ eval via
    ``TorchScriptNet``, real_net.cc:57-87)."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # TorchScript archive: load the scripted module, then read its
        # state dict (same Net2 parameter names).
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    hidden = sd["output.weight"].shape[1]
    n_layers = (
        max(
            int(k.split(".")[1])
            for k in sd
            if k.startswith("body.") and k.endswith(".weight")
        )
        // 4
        + 1
    )
    spec = CFVNetSpec(
        game=game,
        n_hidden=hidden,
        n_layers=n_layers,
        use_layer_norm=any(".1.weight" in k for k in sd),
        **spec_kwargs,
    )
    return spec, net2_state_dict_to_params(sd, spec)


def params_to_net2_state_dict(params: dict, spec: CFVNetSpec) -> dict:
    """Inverse of :func:`net2_state_dict_to_params`: export CFVNet params
    as a torch ``Net2`` state dict (the reference's checkpoint
    interchange role, selfplay.py:548-552), so nets trained here can be
    evaluated by reference tooling."""
    import torch

    p = params["params"]
    stride = 4
    sd = {}
    for k in range(spec.n_layers):
        sd[f"body.{stride * k}.weight"] = torch.from_numpy(
            np.asarray(p[f"Dense_{k}"]["kernel"]).T.copy()
        )
        sd[f"body.{stride * k}.bias"] = torch.from_numpy(
            np.asarray(p[f"Dense_{k}"]["bias"]).copy()
        )
        if spec.use_layer_norm:
            sd[f"body.{stride * k + 1}.weight"] = torch.from_numpy(
                np.asarray(p[f"LayerNorm_{k}"]["scale"]).copy()
            )
            sd[f"body.{stride * k + 1}.bias"] = torch.from_numpy(
                np.asarray(p[f"LayerNorm_{k}"]["bias"]).copy()
            )
    sd["output.weight"] = torch.from_numpy(
        np.asarray(p[f"Dense_{spec.n_layers}"]["kernel"]).T.copy()
    )
    sd["output.bias"] = torch.from_numpy(
        np.asarray(p[f"Dense_{spec.n_layers}"]["bias"]).copy()
    )
    return sd


def build_torch_net2(spec: CFVNetSpec):
    """A torch module with the reference ``Net2``'s exact structure and
    state-dict layout (/root/reference/cfvpy/models.py:20-94): ``body``
    Sequential of [Linear, LayerNorm-or-empty, GELU, empty-Dropout-slot]
    per layer plus an ``output`` Linear, forward = output(body(x)).
    Built fresh here (not copied) so CFVNet params can be round-tripped
    into the interchange format the reference's C++ eval consumes
    (TorchScriptNet, real_net.cc:57-87)."""
    import torch
    from torch import nn

    n_in = 2 + spec.game.num_actions + 2 * spec.game.num_hands
    layers: list = []
    last = n_in
    for _ in range(spec.n_layers):
        layers.append(nn.Linear(last, spec.n_hidden))
        layers.append(
            nn.LayerNorm(spec.n_hidden)
            if spec.use_layer_norm
            else nn.Sequential()
        )
        layers.append(nn.GELU())  # exact erf form, matching flax CFVNet
        layers.append(nn.Sequential())  # dropout slot (always 0 here)
        last = spec.n_hidden

    class _Net2(nn.Module):
        def __init__(self):
            super().__init__()
            self.body = nn.Sequential(*layers)
            self.output = nn.Linear(last, spec.game.num_hands)

        def forward(self, packed_input: torch.Tensor) -> torch.Tensor:
            return self.output(self.body(packed_input))

    return _Net2()


def export_torchscript(params: dict, spec: CFVNetSpec, path: str):
    """Export CFVNet params as a TorchScript ``Net2`` archive — the
    reference's model-interchange format (torch.jit.save at
    selfplay.py:548-552, loaded by real_net.cc:57-71) — so nets trained
    in this framework run under the reference's own eval binaries."""
    import torch

    net = build_torch_net2(spec)
    net.load_state_dict(params_to_net2_state_dict(params, spec))
    net.eval()
    scripted = torch.jit.script(net)
    torch.jit.save(scripted, path)
    return path
