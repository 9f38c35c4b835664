"""Reference-checkpoint interop: a torch Net2's outputs must match the
imported CFVNet exactly (both are float32 MLPs with identical math)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rebel_tpu import LiarsDice
from rebel_tpu.nets.torch_import import load_net2_checkpoint


def build_reference_net2(game, n_hidden=32, n_layers=2):
    """A faithful torch replica of the reference Net2 architecture
    (cfvpy/models.py:20-94) for generating test checkpoints."""
    from torch import nn

    n_in = game.query_size

    class GELU(nn.Module):
        def forward(self, x):
            return nn.functional.gelu(x)

    layers = []
    last = n_in
    for _ in range(n_layers):
        layers += [
            nn.Linear(last, n_hidden),
            nn.LayerNorm(n_hidden),
            GELU(),
            nn.Sequential(),
        ]
        last = n_hidden

    class Net2(nn.Module):
        def __init__(self):
            super().__init__()
            self.body = nn.Sequential(*layers)
            self.output = nn.Linear(n_hidden, game.num_hands)
            with torch.no_grad():
                self.output.weight.data *= 0.01
                self.output.bias *= 0.01

        def forward(self, x):
            return self.output(self.body(x))

    return Net2()


def test_net2_import_matches_torch(tmp_path):
    game = LiarsDice(num_dice=1, num_faces=4)
    torch.manual_seed(0)
    net = build_reference_net2(game)
    path = tmp_path / "ref.ckpt"
    torch.save(net.state_dict(), path)

    spec, params = load_net2_checkpoint(str(path), game)
    assert spec.n_hidden == 32 and spec.n_layers == 2 and spec.use_layer_norm

    x = np.random.RandomState(1).rand(16, game.query_size).astype(np.float32)
    with torch.no_grad():
        expect = net(torch.from_numpy(x)).numpy()
    got = np.asarray(spec.value_fn(params)(x))
    np.testing.assert_allclose(got, expect, atol=2e-6)


def test_net2_import_torchscript(tmp_path):
    """TorchScript archives (the reference's torch.jit.save exports,
    real_net.cc:57-87) load through the same entry point."""
    game = LiarsDice(num_dice=1, num_faces=4)
    torch.manual_seed(3)
    net = build_reference_net2(game)
    path = tmp_path / "ref.torchscript"
    torch.jit.save(torch.jit.script(net), str(path))

    spec, params = load_net2_checkpoint(str(path), game)
    assert spec.n_hidden == 32 and spec.n_layers == 2

    x = np.random.RandomState(2).rand(8, game.query_size).astype(np.float32)
    want = net(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(spec.value_fn(params)(x))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_net2_export_roundtrip(tmp_path):
    """Params trained here export to a torch Net2 state dict that a torch
    replica loads and evaluates identically (reverse interop,
    selfplay.py:548-552 checkpoint role)."""
    from rebel_tpu.nets.cfv_net import CFVNetSpec
    from rebel_tpu.nets.torch_import import (
        load_net2_checkpoint,
        params_to_net2_state_dict,
    )
    import jax

    game = LiarsDice(num_dice=1, num_faces=4)
    spec = CFVNetSpec(game=game, n_hidden=32, n_layers=2)
    params = spec.init_params(jax.random.PRNGKey(5))
    sd = params_to_net2_state_dict(params, spec)

    net = build_reference_net2(game)
    net.load_state_dict(sd)
    x = np.random.RandomState(3).rand(8, game.query_size).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = np.asarray(spec.value_fn(params)(x))
    np.testing.assert_allclose(got, want, atol=2e-6)

    # And back through the importer: full round trip.
    path = tmp_path / "export.ckpt"
    torch.save(sd, path)
    spec2, params2 = load_net2_checkpoint(str(path), game)
    got2 = np.asarray(spec2.value_fn(params2)(x))
    np.testing.assert_allclose(got2, got, atol=1e-7)


def test_export_torchscript_runs_standalone(tmp_path):
    """export_torchscript produces a TorchScript archive that loads and
    evaluates WITHOUT any rebel_tpu code — the interchange contract the
    reference's C++ eval relies on (torch::jit::load, real_net.cc:57-71)."""
    import jax

    from rebel_tpu.nets.cfv_net import CFVNetSpec
    from rebel_tpu.nets.torch_import import export_torchscript

    game = LiarsDice(num_dice=1, num_faces=4)
    spec = CFVNetSpec(game=game, n_hidden=32, n_layers=2)
    params = spec.init_params(jax.random.PRNGKey(7))
    path = tmp_path / "export.torchscript"
    export_torchscript(params, spec, str(path))

    loaded = torch.jit.load(str(path))
    x = np.random.RandomState(4).rand(8, game.query_size).astype(np.float32)
    with torch.no_grad():
        want = loaded(torch.from_numpy(x)).numpy()
    got = np.asarray(spec.value_fn(params)(x))
    np.testing.assert_allclose(got, want, atol=2e-6)
