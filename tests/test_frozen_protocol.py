"""Cross-commit episode-determinism pin (VERDICT r4 item 3).

Episodes are bit-deterministic per task id AT A FIXED CODE VERSION, and
every published multi-room claim rests on paired per-task outcomes of
arms committed under ``experiments/mr22/``.  A code change that alters
agent behavior silently invalidates those arms: matched-seed pairing
only holds within one version (the round-4 regeneration surprise —
random's fix rate moved 0.375 -> 0.427 across versions and the
flagship comparison flipped to a null).

This test replays task 0 of two committed arms under the frozen
protocol (experiments/mr22/run_arm.sh flag-for-flag) and asserts every
scalar outcome matches the committed record.  If it fails, you changed
episode behavior: REGENERATE every arm under experiments/mr22/ (sh
experiments/mr22/queue_r5.sh) and recompute docs/experiments.md before
citing any paired number.  Policy: docs/experiments.md "Protocol".
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MR22 = os.path.join(REPO, "experiments", "mr22")

# run_arm.sh, flag for flag (minus --resume bookkeeping)
PROTOCOL = [
    "--backend", "gridworld", "--platform", "cpu",
    "--camera-size", "48", "--map-height", "160", "--map-width", "160",
    "--map-depth", "24", "--grid-resolution", "0.125",
    "--step-size", "2", "--obstacle-padding", "2",
    "--map-slice-start", "0", "--map-slice-stop", "12",
    "--room-size", "12", "--num-rooms", "3",
    "--num-objects", "5", "--num-misplaced", "2",
    "--exploration-budget-one", "2", "--exploration-budget-two", "2",
    "--max-goal-steps", "60", "--ground-truth-segmentation",
    "--ground-truth-disagreement", "--record-found-objects",
    "--start-task", "0", "--total-tasks", "1",
]

ARMS = {
    "random": [],
    "cond-ihr": ["--frontier-exploration", "--semantic-search-unshuffle",
                 "--policy-checkpoint",
                 os.path.join(REPO, "checkpoints",
                              "policy-conditioned-multiroom"),
                 "--policy-inhibition-radius", "8"],
}


@pytest.mark.slow
@pytest.mark.parametrize("arm", sorted(ARMS))
def test_frozen_protocol_task0_reproduces_committed_arm(arm, tmp_path):
    committed_path = os.path.join(MR22, arm, "results", "0.json")
    if not os.path.exists(committed_path):
        pytest.skip(f"no committed arm at {committed_path}")
    with open(committed_path) as f:
        committed = json.load(f)

    from mass_tpu.agent import cli
    logdir = str(tmp_path / arm)
    cli.main(PROTOCOL + ARMS[arm] + ["--logdir", logdir])

    with open(os.path.join(logdir, "results", "0.json")) as f:
        fresh = json.load(f)

    drift = {
        k: (committed[k], fresh.get(k))
        for k in committed
        if k != "timing" and fresh.get(k) != committed[k]
    }
    assert not drift, (
        f"episode behavior drifted vs the committed {arm} arm — the "
        f"matched-seed arms under experiments/mr22/ are STALE; "
        f"regenerate them (sh experiments/mr22/queue_r5.sh) before "
        f"citing paired numbers.  Diverged fields "
        f"(committed, fresh): {drift}")
