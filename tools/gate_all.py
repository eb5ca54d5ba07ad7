"""The mechanical end-of-round gate: full-registry correctness +
determinism + plan audit + the whole pytest suite, then a refusal check
that every committed record covers EXACTLY the current registry.

Round-7 postmortem: 16 of 257 registry queries ended the round in no
committed correctness/determinism record, and the snapshot shipped with
a red test — because the refreshes were manual steps that slipped.
This tool makes them one command whose non-zero exit means "do not
snapshot":

    python tools/gate_all.py            # ~25 min: everything
    python tools/gate_all.py --fast     # skip pytest (gates only)

Each sub-gate runs as a subprocess (fresh JVM — a leaked temp view or
cached plan in one gate can't mask a failure in the next), and the
record-coverage check runs LAST so a partial record can never look
green.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_TOOLS)
sys.path.insert(0, REPO)


def _run(label: str, cmd: list[str]) -> bool:
    print(f"\n=== {label}: {' '.join(cmd)}", flush=True)
    rc = subprocess.call(cmd, cwd=REPO)
    print(f"=== {label}: {'OK' if rc == 0 else f'FAILED rc={rc}'}",
          flush=True)
    return rc == 0


def _record_coverage(registry: set[str]) -> list[str]:
    """Committed-record drift check: every record carries exactly the
    registry's query set."""
    problems = []
    for fname, key in [("CORRECTNESS_LOCAL.json", "queries"),
                       ("DETERMINISM_LOCAL.json", "queries")]:
        path = os.path.join(REPO, fname)
        if not os.path.exists(path):
            problems.append(f"{fname}: missing")
            continue
        with open(path) as f:
            got = set(json.load(f)[key])
        if got != registry:
            problems.append(
                f"{fname}: {len(got)} entries vs registry "
                f"{len(registry)} (missing {sorted(registry - got)[:5]}"
                f"{'...' if len(registry - got) > 5 else ''})")
    plans = os.path.join(REPO, "PLANS.md")
    if not os.path.exists(plans):
        problems.append("PLANS.md: missing")
    else:
        with open(plans) as f:
            txt = f.read()
        audited = {ln.split("|")[1].strip().strip("`")
                   for ln in txt.splitlines()
                   if ln.startswith("| ")}
        if not registry <= audited:
            miss = sorted(registry - audited)
            problems.append(f"PLANS.md: {len(miss)} queries unaudited "
                            f"({miss[:5]}{'...' if len(miss) > 5 else ''})")
    return problems


def main() -> None:
    fast = "--fast" in sys.argv
    import __spark_entry__ as entrymod

    registry = set(entrymod.queries())
    print(f"registry: {len(registry)} queries")

    ok = True
    ok &= _run("correctness (full registry)",
               [sys.executable, os.path.join(_TOOLS,
                                             "check_correctness.py")])
    ok &= _run("determinism (full registry)",
               [sys.executable, os.path.join(_TOOLS,
                                             "check_determinism.py")])
    ok &= _run("plan audit",
               [sys.executable, os.path.join(_TOOLS, "audit_plans.py")])
    if not fast:
        ok &= _run("pytest", [sys.executable, "-m", "pytest", "tests/",
                              "-q"])

    problems = _record_coverage(registry)
    for p in problems:
        print(f"DRIFT: {p}")
    if problems or not ok:
        print("\nGATE: FAILED — do not snapshot")
        sys.exit(1)
    print(f"\nGATE: all green over {len(registry)} queries — safe to "
          f"snapshot")


if __name__ == "__main__":
    main()
