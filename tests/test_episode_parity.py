"""Fixed-seed episode replication vs the reference RlRunner.

Fixtures in tests/golden/episodes_*.json are recorded from the
*reference implementation* (tools/golden/golden_episodes.cc): the full
training-example stream (queries + counterfactual values) of seeded
self-play episodes.  The TPU engine driven by the same std::mt19937
stream must replicate them — bit-for-bit for FP (whose solver is
bit-exact vs the reference; see test_golden_parity.py)."""

import json
import pathlib

import numpy as np
import pytest

from rebel_tpu.selfplay.replicate import replicate_episodes
from rebel_tpu.selfplay.runner import RecursiveSolvingParams
from rebel_tpu.solving.params import SubgameSolvingParams

GOLDEN = pathlib.Path(__file__).parent / "golden"

CASES = [
    # (fixture, use_cfr, sample_leaf, bitexact)
    ("episodes_fp_1x4.json", False, True, True),
    ("episodes_fp_single_1x4.json", False, False, True),
    # CFR's regret-matching has measure-zero tie discontinuities where
    # 1e-17 summation noise can fork trajectories; assert tight-but-not
    # bit-level agreement.
    ("episodes_cfr_1x4.json", True, True, False),
]


@pytest.mark.parametrize("fixture,use_cfr,sample_leaf,bitexact", CASES)
def test_episode_replication(fixture, use_cfr, sample_leaf, bitexact):
    path = GOLDEN / fixture
    if not path.exists():
        pytest.skip("fixture not generated (tools/golden/golden_episodes)")
    g = json.loads(path.read_text())
    cfg = RecursiveSolvingParams(
        num_dice=1,
        num_faces=4,
        subgame_params=SubgameSolvingParams(
            num_iters=g["num_iters"],
            max_depth=2,
            linear_update=True,
            use_cfr=bool(g["use_cfr"]),
        ),
        random_action_prob=0.25,
        sample_leaf=bool(g["sample_leaf"]),
    )
    mine = replicate_episodes(cfg, seed=g["seed"], episodes=g["episodes"])
    ref_q = [np.array(q, np.float32) for q in g["queries"]]
    ref_v = [np.array(v, np.float32) for v in g["values"]]
    assert len(mine) == len(ref_q)
    for i, ex in enumerate(mine):
        if bitexact:
            np.testing.assert_array_equal(ex.query, ref_q[i], err_msg=f"q{i}")
            np.testing.assert_array_equal(ex.values, ref_v[i], err_msg=f"v{i}")
        else:
            np.testing.assert_allclose(ex.query, ref_q[i], atol=1e-5)
            np.testing.assert_allclose(ex.values, ref_v[i], atol=1e-4)
