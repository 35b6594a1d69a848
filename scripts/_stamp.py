"""Shared artifact-provenance stamp (VERDICT r14 ask #7): every
committed measurement artifact must record the TREE it measured, not
just the last commit — an audit run on a dirty tree previously stamped
the prior commit's sha, which reads as "measured at that commit" when
it wasn't. ``git_stamp()`` returns the short sha plus a ``tree_dirty``
flag (any staged/unstaged change under version control at measurement
time), so a stamp is trustworthy iff ``tree_dirty`` is false.
"""

from __future__ import annotations

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def git_stamp() -> dict:
    try:
        sha = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             cwd=REPO, capture_output=True, text=True,
                             timeout=10).stdout.strip() or "unknown"
    except Exception:
        sha = "unknown"
    try:
        porcelain = subprocess.run(
            ["git", "status", "--porcelain"], cwd=REPO,
            capture_output=True, text=True, timeout=10).stdout
        # committed artifacts rewrite themselves (PLAN_AUDIT.json,
        # MARGINAL_SCALE.md, ...); a json/md-only diff is still a clean
        # measurement of the CODE tree, which is what the flag attests
        dirty = any(
            line and not line[3:].strip().endswith((".json", ".md"))
            for line in porcelain.splitlines())
    except Exception:
        dirty = True
    return {"git_sha": sha, "tree_dirty": dirty}
