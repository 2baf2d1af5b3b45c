#!/usr/bin/env python3
"""Post-exit bench-flag adjudication (VERDICT r14 item 1).

graft.Bench used to spawn the isolated adjudication reruns IN-PROCESS,
while the full-suite JVM (32 threads, tens of GB of heap) was still
resident. bench_adjudication_r14.json finding_3 measured that
configuration inflating isolated readings up to 5x (dd_components
24.05 s in-run vs 4.73 s idle), which is how r13 shipped 12 noise
flags labeled "real" and r14 shipped one more (ml_metrics_cls).

The fixed flow: Bench writes every flag with verdict "pending" and
EXITS; this script — spawned detached by Bench with --wait-pid, or
re-invoked standalone by a human — first waits for the suite JVM to
die, then re-runs each pending query alone in a fresh JVM on the now
quiet machine (tools/adjudicate_bench.sh, 5 iters, median) and patches
the verdicts into bench_regressions.json plus the isolated-baseline
merge into bench_isolated_baseline.json.

Verdict bands (unchanged, idle-vs-idle per the two-vector discipline):
  noise       — isolated median within 1.25x of the stored isolated
                baseline (slower flags) / above 0.75x (faster flags)
  real        — outside the band, in the flagged direction
  real_intentional — outside the band, but the gate is declared in
                tools/intentional_regressions.json (a deliberate
                quality-for-time trade, e.g. a recall floor); the
                verdict carries the declared commit + reason so the
                artifact is self-contained, and the new isolated
                median DOES become the baseline — an intentional new
                cost is the comparison point for the next round, while
                an unexplained regression never ratchets it
  no_baseline — first isolated observation; recorded as the comparison
                point for the next flag on this query
  failed      — the rerun produced no JSON

Baseline merge rule (unchanged): every adjudicated isolated median is
merged into bench_isolated_baseline.json EXCEPT a confirmed-real
slowdown, which keeps comparing against the pre-regression baseline
until fixed (else incremental slowdowns would ratchet the baseline).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REG = os.path.join(REPO, "bench_regressions.json")
BASE = os.path.join(REPO, "bench_isolated_baseline.json")
INTENTIONAL = os.path.join(REPO, "tools", "intentional_regressions.json")


def wait_for_pid(pid: int, timeout_sec: int = 1800) -> None:
    """Block until the suite JVM is gone (so reruns see a quiet box)."""
    deadline = time.time() + timeout_sec
    while time.time() < deadline:
        try:
            os.kill(pid, 0)
        except OSError:
            return
        time.sleep(0.5)
    print(f"WARN: pid {pid} still alive after {timeout_sec}s; proceeding",
          file=sys.stderr)


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--wait-pid":
            wait_for_pid(int(args[i + 1]))
            i += 2
        elif args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        else:
            print(f"unknown arg {args[i]}", file=sys.stderr)
            return 2

    try:
        with open(REG) as f:
            reg = json.load(f)
    except (OSError, ValueError) as e:
        print(f"no readable {REG}: {e}", file=sys.stderr)
        return 1
    pending = sorted(q for q, v in reg.items() if v.get("verdict") == "pending")
    if not pending:
        print("no pending flags; nothing to adjudicate")
        return 0

    try:
        with open(BASE) as f:
            iso_base = json.load(f)
    except (OSError, ValueError):
        iso_base = {}
    try:
        with open(INTENTIONAL) as f:
            intentional = json.load(f)
    except (OSError, ValueError):
        intentional = {}

    print(f"adjudicating {len(pending)} pending flag(s) on the quiet box: "
          f"{' '.join(pending)}")
    out = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "adjudicate_bench.sh")] + pending,
        env={**os.environ, "ADJ_SF_DIR": sf_dir},
        capture_output=True, text=True, cwd=REPO).stdout

    merged = dict(iso_base)
    for line in out.splitlines():
        parts = line.split()
        if len(parts) != 3 or parts[0] != "ISOLATED":
            continue
        q, val = parts[1], parts[2]
        if q not in reg:
            continue
        kind = reg[q].get("kind", "slower")
        if val == "FAILED":
            reg[q]["isolated"], reg[q]["verdict"] = -1.0, "failed"
            continue
        iso = float(val)
        if q not in iso_base:
            verdict = "no_baseline"
        elif kind == "faster":
            verdict = "real" if iso < iso_base[q] * 0.75 else "noise"
        else:
            verdict = "real" if iso > iso_base[q] * 1.25 else "noise"
        if verdict == "real" and kind != "faster" and q in intentional:
            # declared quality-for-time trade: self-contained verdict
            # (commit + reason travel in the artifact), and the new cost
            # becomes the baseline for the next round
            verdict = "real_intentional"
            reg[q]["commit"] = intentional[q].get("commit", "")
            reg[q]["reason"] = intentional[q].get("reason", "")
        reg[q]["isolated"], reg[q]["verdict"] = iso, verdict
        # merge rule: confirmed-real UNEXPLAINED slowdowns keep the old
        # baseline (else incremental slowdowns would ratchet it);
        # intentional ones merge — they ARE the new comparison point
        if not (verdict == "real" and kind != "faster"):
            merged[q] = iso
        print(f"  ADJUDICATED {q:<28s} isolated={iso:.3f}s "
              f"base={iso_base.get(q, float('nan')):.3f}s -> {verdict}")

    with open(REG, "w") as f:
        json.dump(reg, f)
        f.write("\n")
    if merged:
        with open(BASE, "w") as f:
            f.write("{" + ",".join(
                f'"{k}":{v}' for k, v in sorted(merged.items())) + "}\n")
    left = [q for q, v in reg.items() if v.get("verdict") == "pending"]
    if left:
        print(f"WARN: still pending (rerun emitted nothing): {left}",
              file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
