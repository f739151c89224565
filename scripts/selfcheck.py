#!/usr/bin/env python
"""CI-style driver-artifact self-check.

Re-runs the two things the round driver records — ``bench.py`` (real-chip
headline numbers) and ``__graft_entry__.dryrun_multichip(8)`` (multi-device
correctness proof) — and diffs the results against the LAST COMMITTED
``BENCH_r*.json`` / ``MULTICHIP_r*.json`` artifacts, so a red artifact or a
>15% throughput regression is visible to the builder *before* round end
instead of in the next round's verdict.  (Round 4 shipped a red
MULTICHIP_r04.json that this check would have caught.)

Usage:
    python scripts/selfcheck.py                 # bench + dryrun
    python scripts/selfcheck.py --skip-bench    # dryrun only
    python scripts/selfcheck.py --skip-dryrun   # bench only
    python scripts/selfcheck.py --tol 0.10      # tighter regression gate

Exit status: 0 = green, 1 = regression/red artifact, 2 = couldn't run.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fields where SMALLER is better (latency-style); everything else numeric is
# treated as a rate (bigger is better)
_LOWER_BETTER = re.compile(r"(wall_s|latency|_ms|gbytes|err_)")
# fields that vary session-to-session without meaning a regression
_IGNORE = re.compile(
    r"(chip_calibration|roofs|mfu_pct|hbm_util|pct_of|ref_steps|train_steps\b)"
)


def _latest(pattern: str):
    paths = sorted(glob.glob(os.path.join(REPO, pattern)))
    return paths[-1] if paths else None


def _flat(d: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flat(v, key + "."))
        elif isinstance(v, (int, float)) and not isinstance(v, bool):
            out[key] = float(v)
    return out


def check_bench(tol: float) -> int:
    ref_path = _latest("BENCH_r*.json")
    if ref_path is None:
        print("selfcheck: no committed BENCH_r*.json to compare against")
        return 2
    with open(ref_path) as f:
        ref = json.load(f)
    ref_parsed = ref.get("parsed") or {}

    print(f"selfcheck: running bench.py (reference: {os.path.basename(ref_path)})")
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=REPO, capture_output=True, text=True,
            timeout=int(os.environ.get("SELFCHECK_BENCH_TIMEOUT", "3600")),
        )
    except subprocess.TimeoutExpired:
        print(f"selfcheck: bench TIMED OUT after {time.time()-t0:.0f}s")
        return 1
    print(f"selfcheck: bench finished rc={proc.returncode} ({time.time()-t0:.0f}s)")
    if proc.returncode != 0:
        print(proc.stderr[-3000:])
        return 1
    line = next(
        (l for l in reversed(proc.stdout.strip().splitlines())
         if l.startswith("{")), None,
    )
    if line is None:
        print("selfcheck: bench printed no JSON line\n" + proc.stdout[-2000:])
        return 1
    now = json.loads(line)

    ref_flat = {"value": float(ref_parsed.get("value", 0.0))}
    ref_flat.update(_flat(ref_parsed.get("extra") or {}))
    now_flat = {"value": float(now.get("value", 0.0))}
    now_flat.update(_flat(now.get("extra") or {}))

    rc = 0
    for key, ref_v in sorted(ref_flat.items()):
        if _IGNORE.search(key) or ref_v == 0:
            continue
        if key not in now_flat:
            print(f"  MISSING  {key} (was {ref_v})")
            rc = 1
            continue
        now_v = now_flat[key]
        rel = (now_v - ref_v) / abs(ref_v)
        if _LOWER_BETTER.search(key):
            rel = -rel
        tag = "ok"
        if rel < -tol:
            tag, rc = "REGRESSION", 1
        elif rel > tol:
            tag = "improved"
        print(f"  {tag:>10}  {key}: {ref_v:g} -> {now_v:g} ({rel:+.1%})")
    return rc


def check_dryrun() -> int:
    ref_path = _latest("MULTICHIP_r*.json")
    ref_ok = None
    if ref_path:
        with open(ref_path) as f:
            ref_ok = json.load(f).get("ok")
        print(
            f"selfcheck: last committed {os.path.basename(ref_path)}: ok={ref_ok}"
        )
    print("selfcheck: running dryrun_multichip(8) with a FRESH compile cache "
          "(simulates the driver's rejected-cache cold start)")
    env = dict(os.environ)
    t0 = time.time()
    with tempfile.TemporaryDirectory() as tmp:
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(tmp, "jax_cache")
        env.pop("_LCT_DRYRUN_CHILD", None)
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import __graft_entry__ as g; g.dryrun_multichip(8)"],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=int(os.environ.get("SELFCHECK_DRYRUN_TIMEOUT", "1800")),
            )
        except subprocess.TimeoutExpired:
            print(f"selfcheck: dryrun TIMED OUT after {time.time()-t0:.0f}s")
            return 1
    wall = time.time() - t0
    # count PROOF completions, not " OK" substrings: progress lines like
    # "dryrun_flagship: train step OK" must not inflate the count
    proofs_ok = len(re.findall(r"^dryrun_\w+\(.*\bOK\b", proc.stdout, re.M))
    skips = proc.stdout.count("SKIP")
    print(proc.stdout.strip())
    print(f"selfcheck: dryrun rc={proc.returncode}, {proofs_ok} proofs OK / "
          f"{skips} SKIP ({wall:.0f}s)")
    if proc.returncode != 0:
        print(proc.stderr[-3000:])
        return 1
    if proofs_ok < 3 or skips > 0:
        print("selfcheck: not all proofs completed — a SKIPped or missing "
              "proof leaves the multichip record incomplete")
        return 1
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("--skip-dryrun", action="store_true")
    ap.add_argument("--tol", type=float, default=0.15,
                    help="relative regression tolerance (default 0.15)")
    args = ap.parse_args()

    rc = 0
    if not args.skip_bench:
        rc |= check_bench(args.tol)
    if not args.skip_dryrun:
        rc |= check_dryrun()
    print(f"selfcheck: {'GREEN' if rc == 0 else 'RED'}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
