"""Repo-hygiene gates that keep driver runs reproducible.

The one that matters: every ``.jax_cache`` entry produced by the driver-path
jit graphs must be COMMITTED. Round 3 lost its driver-captured benchmark
(BENCH_r03.json rc=124) because the final code state's full-model cache
entries sat untracked and the driver's bench run paid a cold 10-40 min
compile through the tunneled TPU relay. CLAUDE.md's rule ("After
kernel/model changes, re-commit the driver-path entries") is now enforced
here so a round cannot end with a stale cache again.
"""
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_untracked_jax_cache_entries():
    """Fail if `.jax_cache` holds compile-cache entries git does not track.

    An untracked entry means the committed tree would recompile that jit
    graph cold on the driver's machine — exactly the failure that produced an
    empty BENCH_r03.json. Fix: ``git add .jax_cache`` and commit (lock files
    are gitignored and excluded here).
    """
    if not os.path.isdir(os.path.join(REPO, ".git")):
        return  # exported tarball — nothing to check
    out = subprocess.run(
        ["git", "status", "--porcelain", "--ignored=no", ".jax_cache"],
        cwd=REPO, capture_output=True, text=True, timeout=60)
    untracked = [l for l in out.stdout.splitlines() if l.startswith("??")]
    assert not untracked, (
        "Untracked .jax_cache entries — commit them so driver runs hit the "
        f"compile cache (CLAUDE.md rule):\n" + "\n".join(untracked))
