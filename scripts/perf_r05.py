"""Emit PERF_r05.json by RUNNING the benchmark cases (no hand-edited
numbers; VERDICT r4 hygiene item: probe results should be script-emitted).

Each case is a subprocess (bench.py or a probe script) so env knobs apply
cleanly.  bench.py cases follow the developed-flow discipline (>=1000
step warmup); probe cases record their warmup in the entry.  Results
merge into /root/repo/PERF_r05.json so the file can be built up
incrementally across a round.

Usage:
  python scripts/perf_r05.py            # all default cases
  python scripts/perf_r05.py box3d q2_r2    # subset
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "PERF_r05.json")

# name -> (script, env)
CASES = {
    # driver-grade bench.py cases (developed flow, >=1000-step warmup):
    "step2d": ("bench.py", {"BENCH_CASE": "step2d", "BENCH_REPS": "3"}),
    "q2step2d": ("bench.py", {"BENCH_CASE": "q2step2d", "BENCH_REPS": "3"}),
    "box3d": ("bench.py", {"BENCH_CASE": "box3d", "BENCH_REPS": "3"}),
    "cylinder3d": (
        "bench.py", {"BENCH_CASE": "cylinder3d", "BENCH_REPS": "3"}
    ),
    "amr2d": ("bench.py", {"BENCH_CASE": "amr2d", "BENCH_REPS": "3"}),
    # ansatz fast-path probes (VERDICT r4 item 1):
    "q2_r3": (
        "scripts/probe_q2.py",
        {"ANSATZ": "cG Q2", "R": "3", "WARMUP": "1000"},
    ),
    "q3_r1": (
        "scripts/probe_q2.py",
        {"ANSATZ": "cG Q3", "R": "1", "WARMUP": "1000"},
    ),
    "dgq1_r2": (
        "scripts/probe_q2.py",
        {"ANSATZ": "dG Q1", "R": "2", "WARMUP": "1000"},
    ),
    # slab machinery tax (VERDICT r4 item 6):
    "slab_tax_r3": (
        "scripts/probe_slab.py",
        {"R": "3", "SLABS": "1,8", "WARMUP": "300"},
    ),
    # 3D extruded airfoil on the quilt x z canvas (VERDICT r4 item 3);
    # ~same node count as the 534k 2D airfoil probe (R=3 cross-section
    # x 16 z layers):
    # RYUJIN_TILE_D=2: the 88x640 cross-section overflows the 128 MB
    # VMEM at the stacked path's default TD=8 (135.9M program
    # requirement), and the z-slab path's full-cross-section windows
    # cap H*W at ~9k columns — y-tiling would be needed to lift either:
    "airfoil3d": (
        "scripts/probe_multiblock.py",
        {"GEOM": "airfoil3d", "R": "3", "STEPS": "20", "WARMUP": "500",
         "RYUJIN_TILE_D": "2"},
    ),
    # separable statics at >1 GB statics (VERDICT r4 item 7), deep-z box:
    "sep_off_2M_deepz": (
        "scripts/probe_pallas3d.py",
        {"RYUJIN_SEP": "0", "SUBDIV": "[31,16,64]", "R": "2",
         "STEPS": "20"},
    ),
    "sep_on_2M_deepz": (
        "scripts/probe_pallas3d.py",
        {"RYUJIN_SEP": "1", "SUBDIV": "[31,16,64]", "R": "2",
         "STEPS": "20"},
    ),
}

_MQS = re.compile(r"(\d+\.\d+)\s+MQ/s")
_SLAB = re.compile(r"slabs (\d+):\s+(\d+\.\d+) MQ/s")


def run_case(name: str):
    script, extra = CASES[name]
    env = dict(os.environ)
    env.update(extra)
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script)],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        print(f"[{name}] FAILED rc={proc.returncode}")
        print(proc.stdout[-1500:])
        print(proc.stderr[-1500:])
        return None
    rec = None
    if script == "bench.py":
        for ln in proc.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                rec = json.loads(ln)
    elif "probe_slab" in script:
        by = dict(
            (int(m.group(1)), float(m.group(2)))
            for m in _SLAB.finditer(proc.stdout)
        )
        if by:
            base = by.get(1)
            rec = {"mqs_by_slabs": by}
            if base and 8 in by:
                rec["tax_8_slabs"] = round(1.0 - by[8] / base, 4)
    else:
        reps = [float(m.group(1)) for m in _MQS.finditer(proc.stdout)]
        if reps:
            rec = {"value": reps[-1], "unit": "MQ/s/chip", "reps": reps}
            m = re.search(r"n=(\d+)", proc.stdout)
            if m:
                rec["n_dofs"] = int(m.group(1))
    if rec is None:
        print(f"[{name}] no parseable output")
        print(proc.stdout[-1000:])
        return None
    rec["bench_wall_s"] = round(wall, 1)
    rec["cmd"] = " ".join(
        f"{k}={v}" for k, v in extra.items()
    ) + f" python {script}"
    print(f"[{name}] {rec.get('value', rec.get('mqs_by_slabs'))} "
          f"({wall:.0f}s)", flush=True)
    return rec


def main():
    cases = sys.argv[1:] or list(CASES)
    try:
        with open(OUT) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {
            "round": 5,
            "chip": "TPU v5e (axon tunnel), f32, ERK33, "
                    "MQ/s = 1e6 DoF substep updates/s",
            "discipline": "script-emitted; bench.py cases use developed "
                          "flow (>=1000-step warmup), timed reps recorded",
            "results": {},
        }
    for name in cases:
        rec = run_case(name)
        if rec is not None:
            doc["results"][name] = rec
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
