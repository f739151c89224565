"""Driver-artifact regression tests for ``__graft_entry__.dryrun_multichip``.

Round-4 post-mortem (VERDICT r4 missing #1): the dryrun was only ever verified
against a WARM local compile cache; the driver's machine rejects foreign cache
entries (XLA:CPU AOT machine-feature mismatch) and timed out cold
(MULTICHIP_r04 rc=124) with zero OK lines.  These tests run the dryrun the way
the driver does — a subprocess with a FRESH compilation cache directory — and
assert it completes within its internal budget with every proof's OK line
flushed.  Reduced widths keep suite time sane; the budget/skip machinery under
test is width-independent.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_dryrun(tmp_path, budget_s, extra_env=None, timeout=1500):
    env = dict(os.environ)
    # fresh cache dir == the driver's rejected-cache cold start
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "jax_cache")
    env["GRAFT_DRYRUN_BUDGET_S"] = str(budget_s)
    env.setdefault("GRAFT_DRYRUN_FLAGSHIP_W", "128")
    env.setdefault("GRAFT_DRYRUN_COND_W", "128")
    # the parent test process pins cpu via conftest; the child re-pins itself
    env.pop("_LCT_DRYRUN_CHILD", None)
    env.update(extra_env or {})
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )
    wall = time.time() - t0
    return proc, wall


def test_dryrun_cold_cache_completes_within_budget(tmp_path):
    """All three proofs pass COLD (fresh cache) inside the internal budget."""
    budget = 1200
    proc, wall = _run_dryrun(tmp_path, budget, timeout=budget + 300)
    out = proc.stdout
    assert proc.returncode == 0, (out, proc.stderr[-2000:])
    assert "dryrun_multichip(n_devices=8" in out and "OK" in out, out
    assert "dryrun_flagship(" in out and "SKIP" not in out, out
    assert "dryrun_flagship_cond(" in out, out
    # every proof's OK line made it out
    assert out.count("OK") >= 3, out
    assert wall < budget + 120, (wall, out)


def test_dryrun_budget_skips_instead_of_dying(tmp_path):
    """With a budget only the tiny proof fits in, the big proofs SKIP with a
    printed reason and the process still exits 0 — the r04 failure mode
    (timeout with an empty record) is structurally impossible."""
    proc, _ = _run_dryrun(tmp_path, budget_s=1, timeout=1200)
    out = proc.stdout
    assert proc.returncode == 0, (out, proc.stderr[-2000:])
    assert "dryrun_multichip(n_devices=8" in out and "OK" in out, out
    assert out.count("SKIP") == 2, out
    assert "dryrun_flagship: train step OK" not in out, out
