"""Regenerate tests/data/pcw_aerosol_optics.npz from the in-repo PCW
(Wigner) implementation — the NAI2-vs-PCW cross-check is now self-contained
(VERDICT round-1 item 4).

Aerosol: LogNormal(log 0.3, log 2.1), r_max 30, n = 1.3 - 0.001i,
lambda 0.55, nquad_radius 2500 (reference test_Scattering.jl setup).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vsmartmom_tpu.scattering.mie import Aerosol, SizeDistribution
from vsmartmom_tpu.scattering.pcw import compute_aerosol_optical_properties_pcw

t0 = time.time()
aero = Aerosol(SizeDistribution(np.log(0.3), np.log(2.1)), 1.3, 0.001)
opt = compute_aerosol_optical_properties_pcw(aero, 0.55, 30.0, 2500)
print(f"PCW done in {time.time()-t0:.1f}s; ssa={opt.ssa:.12f} k={opt.k:.8e}")

out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "pcw_aerosol_optics.npz")
old = np.load(out)
g = opt.greek_coefs
for name in ("alpha", "beta", "gamma", "delta", "epsilon", "zeta"):
    d = np.abs(getattr(g, name) - old[name]).max()
    print(f"  vs committed truth: {name} max|diff| = {d:.3e}")
print(f"  ssa diff {abs(opt.ssa - float(old['ssa'])):.3e} "
      f"k rel diff {abs(opt.k - float(old['k']))/float(old['k']):.3e}")

np.savez_compressed(out, alpha=g.alpha, beta=g.beta, gamma=g.gamma,
                    delta=g.delta, epsilon=g.epsilon, zeta=g.zeta,
                    ssa=opt.ssa, k=opt.k, ft=1.0)
print("wrote", out)
