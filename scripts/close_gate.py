#!/usr/bin/env python3
"""Fail-loud round-close gate. Run BEFORE declaring a round closed:

    python3 scripts/close_gate.py <round>

Round 10 closed with an EMPTY CORRECTNESS_r10.json and nobody noticed —
a claim whose artifact is empty is indistinguishable from a regression.
This script makes that class of failure impossible to ship silently:

  1. A correctness artifact for the round must exist, parse, and be
     NON-EMPTY with zero FAILs. The driver writes CORRECTNESS_r{N}.json
     after the round ends, so during the round the builder commits its
     own gate output as CORRECTNESS_r{N}_builder.json
     (GRAFT_CHECK_JSON=CORRECTNESS_r{N}_builder.json scripts/check.py …);
     either artifact satisfies the gate, an empty one satisfies nothing.
  2. BENCH artifact sanity: BENCH_r{N}.json (if present) must be
     non-empty JSON with rc == 0.
  3. Anchor freshness: bench_round_close.json must carry the same query
     count as bench_full.json (a stale anchor sat two rounds unnoticed).
  4. git status must be clean — uncommitted artifacts are how round 10
     lost its evidence.

Exit 0 = close is clean; exit 1 prints every violated check.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path):
    with open(os.path.join(REPO, path)) as f:
        return json.load(f)


def main():
    if len(sys.argv) != 2:
        sys.exit(__doc__)
    rnd = int(sys.argv[1])
    errs = []

    # 1. correctness artifact: driver's, else the builder's own
    ok_correctness = False
    for cand in (f"CORRECTNESS_r{rnd:02d}.json", f"CORRECTNESS_r{rnd}.json",
                 f"CORRECTNESS_r{rnd:02d}_builder.json",
                 f"CORRECTNESS_r{rnd}_builder.json"):
        p = os.path.join(REPO, cand)
        if not os.path.exists(p):
            continue
        try:
            data = load(cand)
        except Exception as e:
            errs.append(f"{cand}: unparseable JSON ({e})")
            continue
        if not data:
            errs.append(f"{cand}: EMPTY artifact — verifies nothing")
            continue
        queries = data.get("queries", data)
        if not queries:
            errs.append(f"{cand}: zero queries recorded")
            continue
        nfail = data.get("fail")
        if nfail is None:  # driver shape: per-query dicts
            nfail = sum(1 for v in queries.values()
                        if isinstance(v, dict) and v.get("hash_match") is False)
        if nfail:
            errs.append(f"{cand}: {nfail} FAILs recorded — not a clean close")
            continue
        print(f"OK correctness: {cand} ({len(queries)} queries, 0 fail)")
        ok_correctness = True
        break
    if not ok_correctness and not errs:
        errs.append(f"no correctness artifact for round {rnd} "
                    f"(CORRECTNESS_r{rnd}.json or _builder variant)")

    # 2. bench artifact sanity
    for cand in (f"BENCH_r{rnd:02d}.json", f"BENCH_r{rnd}.json"):
        p = os.path.join(REPO, cand)
        if os.path.exists(p):
            try:
                b = load(cand)
                if not b:
                    errs.append(f"{cand}: empty")
                elif b.get("rc", 0) != 0:
                    errs.append(f"{cand}: rc={b.get('rc')} — bench leg failed")
                else:
                    print(f"OK bench: {cand}")
            except Exception as e:
                errs.append(f"{cand}: unparseable ({e})")
            break

    # 3. anchor freshness
    try:
        anchor = load("bench_round_close.json")
        full = load("bench_full.json")
        na, nf = len(anchor.get("queries", {})), len(full.get("queries", {}))
        if na != nf:
            errs.append(f"bench_round_close.json is STALE: {na} queries vs "
                        f"bench_full.json's {nf} — refresh the anchor from "
                        "the protocol-clean close run")
        else:
            print(f"OK anchor: {na} queries in both artifacts")
    except Exception as e:
        errs.append(f"anchor check failed: {e}")

    # 4. conversion-determinism audit (the r11 class: DuckDB's direct
    #    HUGEINT->DOUBLE is not correctly rounded; every sum()->DOUBLE in
    #    SQL text must be string-routed or adjudicated bounded)
    import glob
    q = glob.glob(os.path.join(REPO, "src/main/scala/graft/queries/*.scala"))
    det = subprocess.run([sys.executable,
                          os.path.join(REPO, "scripts/detcast.py")] + q,
                         capture_output=True, text=True)
    if det.returncode != 0:
        errs.append("detcast audit FAILED:\n" + det.stderr.strip())
    else:
        print("OK detcast: " + det.stdout.strip())

    # 5. clean working tree
    st = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                        capture_output=True, text=True).stdout.strip()
    if st:
        errs.append("git status is NOT clean at close:\n" + st)
    else:
        print("OK git: working tree clean")

    if errs:
        print("\nCLOSE GATE: FAIL")
        for e in errs:
            print(f"  - {e}")
        sys.exit(1)
    print("\nCLOSE GATE: PASS")


if __name__ == "__main__":
    main()
