"""Device-trace the RRS solve and attribute op time (round-4: why is the
inelastic ladder 30x slower per point than the elastic solve?)."""
import glob
import gzip
import json
import sys
from collections import defaultdict

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from bench_rrs_common import build  # noqa: E402


def main(n_spec=256):
    fn, inputs = build(n_spec)
    out = fn(inputs)
    _ = np.asarray(out["ieR"])

    logdir = "/tmp/jaxtrace_rrs"
    with jax.profiler.trace(logdir):
        out = fn(inputs)
        _ = np.asarray(out["ieR"])

    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace written"); return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    by_name = defaultdict(float)
    for e in events:
        by_name[e.get("name", "?")] += e["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:40]
    tot = sum(by_name.values())
    print(f"total traced op-time {tot/1e3:.1f} ms (1 solve, all lanes)")
    for name, dur in top:
        print(f"  {dur/1e3:9.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
