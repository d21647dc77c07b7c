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

    # 1. correctness artifact: driver's, else the builder's own. A clean
    #    candidate satisfies the gate; STALE/EMPTY/UNPARSEABLE other
    #    candidates are demoted to warnings (a stale-empty driver artifact
    #    must not veto a clean builder artifact) — but a candidate that
    #    records REAL FAILs is a hard error unless the clean artifact is
    #    at least as recent as the failing one. Before this rule, a
    #    builder's self-reported clean artifact could silently override an
    #    independent driver artifact that recorded failures.
    ok_correctness = False
    clean_mtime = None
    soft_problems = []           # empty / unparseable / zero-queries
    fail_problems = []           # (message, mtime) — nfail > 0
    for cand in dict.fromkeys(  # dedupe: r{N:02d} ≡ r{N} for N ≥ 10
            (f"CORRECTNESS_r{rnd:02d}.json", f"CORRECTNESS_r{rnd}.json",
             f"CORRECTNESS_r{rnd:02d}_builder.json",
             f"CORRECTNESS_r{rnd}_builder.json")):
        p = os.path.join(REPO, cand)
        if not os.path.exists(p):
            continue
        try:
            data = load(cand)
        except Exception as e:
            soft_problems.append(f"{cand}: unparseable JSON ({e})")
            continue
        if not data:
            soft_problems.append(f"{cand}: EMPTY artifact — verifies nothing")
            continue
        queries = data.get("queries", data)
        if not queries:
            soft_problems.append(f"{cand}: zero queries recorded")
            continue
        nfail = data.get("fail")
        if nfail is None:  # driver shape: per-query dicts
            nfail = sum(1 for v in queries.values()
                        if isinstance(v, dict) and v.get("hash_match") is False)
        if nfail:
            fail_problems.append(
                (f"{cand}: {nfail} FAILs recorded — not a clean close",
                 os.path.getmtime(p)))
            continue
        if not ok_correctness:  # first clean candidate wins (driver first)
            print(f"OK correctness: {cand} ({len(queries)} queries, 0 fail)")
            ok_correctness = True
            clean_mtime = os.path.getmtime(p)
    if ok_correctness:
        for w in soft_problems:
            print(f"WARN (other candidate): {w}")
        for msg, mt in fail_problems:
            if mt > clean_mtime:
                errs.append(f"{msg} (and it is NEWER than the clean "
                            "artifact — a clean candidate cannot override "
                            "more recent recorded failures)")
            else:
                print(f"WARN (superseded by newer clean artifact): {msg}")
    else:
        errs.extend(soft_problems)
        errs.extend(msg for msg, _ in fail_problems)
        if not soft_problems and not fail_problems:
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

    # 3b. bench RECENCY: the committed full-suite bench must postdate the
    #     last src/ commit (r11 shipped a bench predating the round's
    #     headline perf feature; presence+count checks missed it). The
    #     bench artifact embeds the HEAD hash it ran at ("git_head"); the
    #     last commit touching src/ must be an ancestor of (or equal to)
    #     that hash. Fallback for pre-r12 artifacts without the field:
    #     file mtime vs the src commit's time.
    try:
        full = load("bench_full.json")
        src_info = subprocess.run(
            ["git", "log", "-1", "--format=%H %ct", "--", "src"],
            cwd=REPO, capture_output=True, text=True).stdout.split()
        if src_info:
            src_hash, src_time = src_info[0], int(src_info[1])
            head = full.get("git_head")
            if head:
                anc = subprocess.run(
                    ["git", "merge-base", "--is-ancestor", src_hash, head],
                    cwd=REPO, capture_output=True)
                if anc.returncode != 0:
                    errs.append(
                        f"bench_full.json is STALE: ran at {head[:12]} which "
                        f"does not contain the last src/ commit "
                        f"{src_hash[:12]} — re-run the full bench")
                else:
                    print(f"OK bench recency: bench ran at {head[:12]} "
                          f"⊇ last src commit {src_hash[:12]}")
                if full.get("git_dirty"):
                    print("WARN bench recency: bench ran with a DIRTY "
                          "working tree — its head hash under-describes "
                          "the measured code")
            else:
                mtime = os.path.getmtime(os.path.join(REPO, "bench_full.json"))
                if mtime < src_time:
                    errs.append(
                        "bench_full.json is STALE: no git_head field and "
                        f"mtime predates the last src/ commit — re-run "
                        "the full bench")
                else:
                    print("OK bench recency (mtime fallback): artifact "
                          "postdates the last src/ commit")
    except Exception as e:
        errs.append(f"bench recency check failed: {e}")

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

    # 4b. the ceiling machinery itself must work (a synthetic over-ceiling
    #     entry must trip) and every adjudication must carry a ceiling
    ct = subprocess.run([sys.executable,
                         os.path.join(REPO, "scripts/test_detcast_ceilings.py")],
                        capture_output=True, text=True)
    if ct.returncode != 0:
        errs.append("detcast ceiling self-test FAILED:\n" + ct.stderr.strip())
    else:
        print("OK " + ct.stdout.strip())

    # 4c. ceiling PLACEMENT is measured against the real sf1 dataset and
    #     the 2^53 edge behavior matches the doctrine (r14; the check that
    #     caught the f4-unpivot entry sized off the wrong table, 350x
    #     unsafe). Skipped with a warning if target/sf1 was never built.
    if os.path.isfile(os.path.join(REPO, "target/sf1/.complete")):
        cb = subprocess.run([sys.executable,
                             os.path.join(REPO, "scripts/test_ceiling_boundary.py"),
                             os.path.join(REPO, "target/sf1")],
                            capture_output=True, text=True)
        if cb.returncode != 0:
            errs.append("ceiling boundary test FAILED:\n" +
                        (cb.stdout + cb.stderr).strip()[-2000:])
        else:
            print("OK ceiling boundary: " +
                  cb.stdout.strip().splitlines()[-1])
    else:
        print("WARN ceiling boundary test skipped: target/sf1 not built")

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
