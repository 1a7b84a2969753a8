"""Pinned-trajectory regression gate (VERDICT r4 #5).

The vendored CSVs under tests/data/pinned_trajectory/ are the exact
20-epoch per-fold trajectories of a fixed-seed synthetic MUTAG run on
the dense and block fold-lockstep engines (the reference's per-epoch
artifact contract, reference train.py:113-136). The coarse ≥70%
learnability gates cannot see a few-point accuracy bug; this compare
can: any math-changing edit shifts per-epoch losses at far more than
the 1e-4 tolerance by epoch 20 (training trajectories amplify
differences), while pure refactors stay bitwise identical.

If a change is INTENTIONALLY math-changing (a new default kernel, a
reassociation), regenerate with `python tools/pinned_trajectory.py
--write` and say so in the commit message.
"""

import numpy as np
import pytest

from tools.pinned_trajectory import (
    LAYOUTS,
    NUM_EPOCHS,
    artifact_path,
    run_pinned,
)


def _parse(text):
    rows = [r.split(",") for r in text.strip().splitlines()[1:]]
    return np.array([[float(x) for x in r] for r in rows])


@pytest.mark.parametrize("layout", LAYOUTS)
def test_pinned_trajectory(tmp_path, layout):
    got = run_pinned(layout, str(tmp_path))
    for fold, text in got.items():
        with open(artifact_path(layout, fold)) as f:
            want = _parse(f.read())
        have = _parse(text)
        assert have.shape == (NUM_EPOCHS, 5)
        np.testing.assert_allclose(
            have, want, rtol=1e-4, atol=1e-6,
            err_msg=(
                f"{layout} fold {fold} trajectory drifted — a "
                "math-changing edit reached the training path. If "
                "intentional, regenerate via `python "
                "tools/pinned_trajectory.py --write` and record why."
            ),
        )
