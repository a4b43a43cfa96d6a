"""Summarize a JAX profiler trace: TPU op time grouped by op family.

Usage: python docs/parse_trace.py /tmp/jax_trace [steps]
"""

import collections
import glob
import gzip
import json
import re
import sys


def main(trace_dir: str, steps: int = 3) -> None:
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    indiv = collections.defaultdict(float)
    argmap = {}
    tot = 0.0
    for e in events:
        if e.get("ph") == "X" and pids.get(e["pid"], "").startswith("/device:TPU"):
            name = e["name"]
            if name.startswith("jit_") or name.isdigit():
                continue
            base = re.sub(r"\.\d+", "", name)
            agg[base] += e["dur"]
            cnt[base] += 1
            indiv[name] += e["dur"]
            tot += e["dur"]
            if e.get("args"):
                argmap[name] = e["args"]
    print(f"total op time: {tot/steps/1e3:.1f} ms/step")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{dur/steps/1e3:9.2f} ms/step  n={cnt[name]:5d}  {name[:60]}")
    print("--- top individual ---")
    for name, dur in sorted(indiv.items(), key=lambda kv: -kv[1])[:15]:
        ba = argmap.get(name, {}).get("bytes_accessed", "?")
        print(f"{dur/steps/1e3:8.2f} ms  {name[:40]:40s} bytes={ba}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 3)
