"""Capture a jax.profiler device trace of the bench solve and print the
op-level time attribution (top ops + grouped classes)."""
import dataclasses
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import jax
import numpy as np

sys.path.insert(0, "/root/repo")
from __graft_entry__ import _flagship_model  # noqa: E402

from vsmartmom_tpu.core.solver import rt_solve  # noqa: E402


def main():
    n_spec = 1024
    model = _flagship_model(n_spec=n_spec, dtype=np.float32, nstreams=8)
    inputs, config = model.build_band(0)
    fn = jax.jit(lambda x: rt_solve(x, config)["R"])
    out = fn(inputs)
    jax.block_until_ready(out)

    logdir = "/tmp/jaxtrace"
    with jax.profiler.trace(logdir):
        for _ in range(4):
            out = fn(inputs)
        jax.block_until_ready(out)

    # parse trace.json.gz
    paths = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace written"); return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep device-lane events (TensorFlow Op / XLA Op lanes)
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        args = e.get("args") or {}
        cat = args.get("group_by", "")
        name = e.get("name", "?")
        pid = e.get("pid", 0)
        tid_name = ""
        by_name[name] += e["dur"]
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[:30]
    tot = sum(by_name.values())
    print(f"total traced op-time {tot/1e3:.1f} ms (4 solves incl. host rows)")
    for name, dur in top:
        print(f"  {dur/1e3:9.2f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
