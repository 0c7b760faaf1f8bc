"""Record the round's SOLO bench artifact.

Driver BENCH totals are only comparable against the driver's own
history: ambient load from sibling processes inflates full-suite wall
time 30-60% (measured r7/r8), while per-query solo medians reproduce
exactly. This wrapper runs bench.py only when the machine is quiet,
stamps the result with the observed load, and writes it to
``BENCH_SOLO_r{N}.json`` next to the driver's file -- the committed
artifact cross-round comparisons can use without archaeology
(VERDICT r8 next-round item 8).

Usage: python tools/solobench.py 9          # writes BENCH_SOLO_r09.json
       python tools/solobench.py 9 --force  # skip the load gate
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

LOAD_GATE = 4.0  # 1-min loadavg above this on a 32-cpu box => not solo


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    force = "--force" in sys.argv
    if not args:
        print("usage: python tools/solobench.py ROUND [--force]", file=sys.stderr)
        return 2
    rnd = int(args[0])

    load1, load5, _ = os.getloadavg()
    if load1 > LOAD_GATE and not force:
        print(
            f"loadavg {load1:.2f} > {LOAD_GATE}: not a solo machine; "
            "wait for background work to drain or pass --force",
            file=sys.stderr,
        )
        return 1

    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True
    )
    if out.returncode != 0:
        # surface the child's actual failure instead of a bare
        # CalledProcessError (the traceback lives on ITS stderr)
        sys.stderr.write(out.stderr[-4000:])
        print(f"bench.py failed with exit {out.returncode}", file=sys.stderr)
        return out.returncode
    json_lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not json_lines:
        sys.stderr.write(out.stdout[-2000:])
        print("bench.py exited 0 but printed no JSON line", file=sys.stderr)
        return 1
    # bench.py prints the FULL payload first and a compact driver-tail
    # summary last (VERDICT r10 #5); the longest line is the full one.
    line = max(json_lines, key=len)
    payload = json.loads(line)
    payload["solo"] = {"loadavg_1m_at_start": round(load1, 2), "loadavg_5m_at_start": round(load5, 2)}

    # the semdedup replica-protocol pair (VERDICT r12 #5): the
    # 10x-byte-identical-replica contrast (plain form quadratic-class
    # vs the exact-first composition ~flat) is re-MEASURED every
    # round and recorded in the artifact, so the ladder's scaling
    # claim never degrades into a remembered number. ~2 min on top of
    # the bench run; non-fatal if the scale10 harness fails.
    here = os.path.dirname(os.path.abspath(__file__))
    s10 = [sys.executable, os.path.join(here, "scale10.py"), "--json",
           "semdedup_near_dup", "semdedup_exact_first"]
    if os.path.isdir(os.path.join(os.path.dirname(here), ".scale10")):
        s10.insert(2, "--skip-gen")
    rep = subprocess.run(s10, capture_output=True, text=True)
    rep_lines = [l for l in rep.stdout.splitlines() if l.startswith("{")]
    if rep.returncode == 0 and rep_lines:
        payload["replica10"] = json.loads(rep_lines[-1])
    else:
        sys.stderr.write(rep.stderr[-1500:])
        print("scale10 replica pair failed; BENCH_SOLO omits replica10", file=sys.stderr)
    path = f"BENCH_SOLO_r{rnd:02d}.json"
    # Contamination backstop (learned the hard way: three runs that
    # PASSED the loadavg gate recorded 1.2x-5.5x the standing total
    # while targeted per-query probes at true quiet reproduced the
    # old medians -- ambient contention is not always visible in
    # loadavg at launch). If an artifact for this round exists and
    # the new total regresses >25% on IDENTICAL code, that is almost
    # certainly the box, not the queries: refuse unless --force.
    if os.path.exists(path) and not force:
        with open(path) as f:
            prev = json.load(f)
        if payload["value"] > 1.25 * prev["value"]:
            print(
                f"refusing to overwrite {path}: new total "
                f"{payload['value']} s is >1.25x the standing "
                f"{prev['value']} s -- contaminated run is far more "
                "likely than a real uniform regression; re-run on a "
                "drained box or pass --force if the code truly changed",
                file=sys.stderr,
            )
            return 1
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {path}: total {payload['value']} s, {len(payload['queries'])} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
