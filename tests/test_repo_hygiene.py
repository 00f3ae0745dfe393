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


def test_bench_final_line_fits_driver_tail_buffer():
    """The driver captures only ~1.5 KB of bench.py's stdout tail; six
    rounds of `"parsed": null` traced to the final JSON line outgrowing
    it (VERDICT r6 item 1). Reconstruct the worst-case final line from
    the current HEADLINE list and assert it stays well under budget,
    so adding headline queries can never silently re-break the driver's
    perf pipeline."""
    import json
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import bench

    def short(name: str) -> str:
        import re

        m = re.match(r"q\d+[a-z]?$", name.split("_", 1)[0])
        return m.group(0) if m else name[:12]

    names = [*bench.HEADLINE, "ooh_xml_10k"]
    shorts = [short(n) for n in names]
    assert len(set(shorts)) == len(shorts), "short-key collision in HEADLINE"
    worst = {s: 99999.999 for s in shorts}
    line = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": 999999.999,
            "unit": "sec",
            "queries": worst,
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    assert len(line) < 1200, (
        f"bench final line would be {len(line)} bytes — over the ~1.5 KB "
        "driver tail buffer safety margin; shorten keys or trim HEADLINE"
    )
