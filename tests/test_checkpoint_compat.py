"""Cross-round checkpoint compatibility: the shipped pretrained artifacts must
restore into freshly-built templates and reproduce pinned outputs.

Reference analog: the reference ships models/pretrained_agent and
vae/models/* and run_eval.py restores them with tf.train.Saver
(ppo.py:207-216); a refactor that breaks restore breaks the product. These
tests pin (a) pytree-structure compatibility (StandardRestore fails loudly on
mismatch) and (b) the numerical outputs on deterministic inputs.

Refreshing an artifact deliberately? `python -m tests.checkpoint_goldens`.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from tests import checkpoint_goldens as cg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _goldens():
    with open(cg.GOLDEN_PATH) as f:
        return json.load(f)


def _assert_close(actual, expected, rtol=1e-5, atol=1e-5):
    np.testing.assert_allclose(np.asarray(actual), np.asarray(expected), rtol=rtol, atol=atol)


@pytest.mark.parametrize(
    "name",
    ["lap_agent", "mixed_agent", "pixel_agent", "latent_agent",
     "route_latent_agent", "traffic_agent", "pixel_turnkey_agent",
     "rgb_latent_agent", "seg_vae", "deprop_vae", "rgb_deprop_vae",
     "rgb_recon_vae"],
)
def test_checkpoint_restores_and_matches_golden(name):
    goldens = _goldens()
    if name not in goldens:
        pytest.fail(
            f"{name} has no golden entry — the shipped artifact was missing "
            "when tests/golden/checkpoint_goldens.json was regenerated. "
            "Restore the artifact and rerun `python -m tests.checkpoint_goldens`."
        )
    got = cg.COMPUTE_FNS[name](REPO)
    want = goldens[name]
    if "step" in want:
        assert got["step"] == want["step"], (
            f"latest checkpoint step moved {want['step']} -> {got['step']}; "
            "if deliberate, regenerate goldens"
        )
        _assert_close(got["mean"], want["mean"])
        _assert_close(got["std"], want["std"])
        _assert_close(got["value"], want["value"])
    else:
        _assert_close(got["z_prefix"], want["z_prefix"])
        _assert_close(got["z_sum"], want["z_sum"], rtol=1e-4)
