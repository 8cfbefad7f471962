"""Compiled-TPU parity for the fused product path (VERDICT r3 item 8).

tests/conftest.py forces the CPU backend for the whole pytest process, so
the compiled Mosaic kernels can't run in-process; this suite shells out to
a clean-environment subprocess that compiles the fused band kernel on the
real chip and checks it against the plain XLA path on-device.  Skips
cleanly when no TPU is reachable (CI CPU runs), making the bench.py parity
gate CI-visible instead of bench-only.
"""

import json
import os
import subprocess
import sys

import pytest

_PROBE = r"""
import dataclasses, json, sys
import jax, numpy as np
sys.path.insert(0, {repo!r})
from __graft_entry__ import _flagship_model
from vsmartmom_tpu.core.solver import rt_solve

if jax.default_backend() != "tpu":
    print(json.dumps({{"skip": "no tpu"}})); sys.exit(0)

model = _flagship_model(n_spec=128, dtype=np.float32, nstreams=8)
inputs, config = model.build_band(0)
assert config.fused and config.dot_mode == "split3d", (
    config.fused, config.dot_mode)
plain = dataclasses.replace(config, fused=False, pack=1, m_scat=-1,
                            ns_sched=(), ns_inter=6, dot_mode="highest")
out = np.asarray(jax.jit(lambda x: rt_solve(x, config)["R"])(inputs))
ref = np.asarray(jax.jit(lambda x: rt_solve(x, plain)["R"])(inputs))
rel = float(np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-30))
print(json.dumps({{"rel": rel, "finite": bool(np.isfinite(out).all())}}))
"""


def _clean_env():
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS"):
        env.pop(k, None)
    return env


@pytest.mark.skipif(os.environ.get("VSM_SKIP_TPU_TESTS") == "1",
                    reason="explicitly disabled")
def test_fused_band_compiled_parity_on_tpu():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE.format(repo=repo)],
        capture_output=True, text=True, timeout=1200, env=_clean_env(),
        cwd=repo)
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        # No TPU (import/backend failure) -> skip, anything else -> fail.
        if "no tpu" in proc.stdout + proc.stderr or not lines:
            pytest.skip(f"TPU unavailable: {proc.stderr[-400:]}")
    res = json.loads(lines[-1])
    if "skip" in res:
        pytest.skip(res["skip"])
    assert res["finite"]
    assert res["rel"] < 1e-4, f"compiled fused-vs-plain parity {res['rel']:.2e}"


_PROBE_RRS = r"""
import json, sys
import jax, numpy as np
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/scripts")
if jax.default_backend() != "tpu":
    print(json.dumps({{"skip": "no tpu"}})); sys.exit(0)

from bench_rrs import _model
from vsmartmom_tpu.core import inelastic as IE
from vsmartmom_tpu.core.inelastic import (inelastic_setup, rt_solve_rrs,
                                          rt_solve_rrs_fused)

model = _model(64)
(inputs, config, shifts, w_shifts, Zp, Zm, fscatt,
 src_fn) = inelastic_setup(model)
assert config.fused, config
out = rt_solve_rrs_fused(inputs, config, shifts, w_shifts, Zp, Zm, fscatt)
# exact ie dots for the XLA reference — this also gates the TPU-only
# IE_PRECISION default ('default' single-pass dots) that CPU CI cannot
# see (ADVICE r4 item 1): the comparison below includes that choice.
IE.IE_PRECISION = "highest"
ref = rt_solve_rrs(inputs, config, shifts, w_shifts, Zp, Zm, fscatt,
                   src_fn=src_fn)
rels = {{}}
for k in ("R", "ieR"):
    a, b = np.asarray(out[k]), np.asarray(ref[k])
    rels[k] = float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30))
print(json.dumps({{"rels": rels,
                   "finite": bool(np.isfinite(np.asarray(out["ieR"])).all())}}))
"""


@pytest.mark.skipif(os.environ.get("VSM_SKIP_TPU_TESTS") == "1",
                    reason="explicitly disabled")
def test_fused_rrs_compiled_parity_on_tpu():
    """Compiled-chip gate for the block-bichromatic RRS kernel vs the
    exact-precision XLA ie path: covers the Mosaic lowering, the coarse
    ie-ladder resolution, AND the TPU-only IE_PRECISION default in one
    measurement (the CPU suite structurally cannot see any of them)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE_RRS.format(repo=repo)],
        capture_output=True, text=True, timeout=1800, env=_clean_env(),
        cwd=repo)
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        if "no tpu" in proc.stdout + proc.stderr or not lines:
            pytest.skip(f"TPU unavailable: {proc.stderr[-400:]}")
    res = json.loads(lines[-1])
    if "skip" in res:
        pytest.skip(res["skip"])
    assert res["finite"]
    assert res["rels"]["R"] < 1e-4, res
    assert res["rels"]["ieR"] < 5e-3, res
