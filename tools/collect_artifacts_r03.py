#!/usr/bin/env python
"""Assemble the round-3 driver-verifiable artifacts from the individual
benchmark outputs:

* RESOLUTION_r03.json — the high-ndim resolution sweep (coo/dense paths +
  the T4 rank-5 tier) merged with the separate Pallas-path run.
* SCALING_r03.json   — multiprocess weak scaling + virtual-mesh scaling +
  the model-axis (tensor-parallel) mesh points at ndim 400.
* LYAPUNOV_r03.json  — on-chip BLV throughput tiers + twofloat accuracy.

Each input is the JSON file its benchmark wrote (see the individual
scripts' QGS_*_OUT env knobs / stdout).  Inputs that are missing are
skipped with a note, so partial reruns still produce artifacts.
"""

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def load(path):
    p = pathlib.Path(path)
    if not p.exists():
        print(f"  missing: {path}", file=sys.stderr)
        return None
    with open(p) as fh:
        txt = fh.read().strip()
    # accept either a bare JSON doc or a log whose last line is the doc
    try:
        return json.loads(txt)
    except json.JSONDecodeError:
        for line in reversed(txt.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
    return None


def main(argv):
    args = dict(a.split("=", 1) for a in argv if "=" in a)
    out = {}

    main_sweep = load(args.get("sweep", "/root/repo/.res_sweep_main.json"))
    tail = load(args.get("tail", "/root/repo/.res_sweep_tail.json"))
    pallas = load(args.get("pallas", "/root/repo/.res_sweep_pallas.json"))
    if main_sweep:
        # later runs (tail/pallas) override earlier points for the same
        # (config, path): the tail re-measured 6x6 dense after a wedged
        # worker produced a non-physical timing in the first pass
        merged = {}
        for doc in (main_sweep, tail, pallas):
            for p in (doc or {}).get("points", []):
                merged[(p.get("config"), p.get("path"))] = p
        points = list(merged.values())
        doc = dict(main_sweep)
        doc["points"] = points
        with open(REPO / "RESOLUTION_r03.json", "w") as fh:
            json.dump(doc, fh, indent=1)
        print(f"RESOLUTION_r03.json: {len(points)} points")

    scaling_parts = {}
    for key, default in [("mp", "/tmp/scaling_mp.json"),
                         ("vmesh", "/tmp/scaling_vmesh.json"),
                         ("modelaxis", "/tmp/model_axis_8x8.json")]:
        doc = load(args.get(key, default))
        if doc:
            scaling_parts[{"mp": "multiprocess_weak_scaling",
                           "vmesh": "virtual_mesh_weak_scaling",
                           "modelaxis": "model_axis_mesh"}[key]] = doc
    if scaling_parts:
        with open(REPO / "SCALING_r03.json", "w") as fh:
            json.dump(scaling_parts, fh, indent=1)
        print(f"SCALING_r03.json: {sorted(scaling_parts)}")

    lyap = load(args.get("lyap", "/tmp/lyap_tpu.json"))
    if lyap:
        with open(REPO / "LYAPUNOV_r03.json", "w") as fh:
            json.dump(lyap, fh, indent=1)
        print("LYAPUNOV_r03.json written")


if __name__ == "__main__":
    main(sys.argv[1:])
