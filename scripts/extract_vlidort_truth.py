"""Extract the VLIDORT 2.8.3 solar_tester truth tables (published Fortran
reference outputs, committed in the reference tree as Julia data files) into
tests/data/vlidort_solar_tester.npz.

Data provenance: VLIDORT 2.8.3 vlidort_s_test/results_solar_tester.all and
vlidort_v_test/results_solar_tester_IQU0.all via
/root/reference/test/vlidort_baseline/reference_data/*.jl. This is published
numeric DATA (like the Natraj/Siewert tables), not code.
"""
import os
import re

import numpy as np

REF = "/root/reference/test/vlidort_baseline/reference_data"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "vlidort_solar_tester.npz")


def parse_const_vector(text, name):
    m = re.search(rf"const {name}\s*=\s*(?:reshape\()?(?:Float64)?\[(.*?)\]",
                  text, re.S)
    if not m:
        raise KeyError(name)
    body = re.sub(r"#.*", "", m.group(1))
    return np.array([float(x) for x in body.replace("\n", " ").split(",")
                     if x.strip()])


def main():
    scal = open(os.path.join(REF, "solar_tester_truth.jl")).read()
    stokes = parse_const_vector(scal, "SOLAR_TESTER_STOKES")
    # Julia reshape is column-major: flat index = geom + 36*(level-1) + ...
    scalar_I = stokes.reshape(6, 2, 5, 36).transpose(3, 2, 1, 0)

    vec = open(os.path.join(REF, "solar_tester_vector_truth.jl")).read()
    vecs = {}
    for s in ("I", "Q", "U"):
        flat = parse_const_vector(vec, f"SOLAR_TESTER_VECTOR_{s}")
        vecs[s] = flat.reshape(6, 2, 5, 36).transpose(3, 2, 1, 0)

    atm = open(os.path.join(REF, "solar_tester_atmosphere.jl")).read()
    height = parse_const_vector(atm, "SOLAR_TESTER_HEIGHT_KM")
    molext = parse_const_vector(atm, "SOLAR_TESTER_MOLEXT")
    molomg = parse_const_vector(atm, "SOLAR_TESTER_MOLOMG")

    aer = open(os.path.join(REF, "solar_tester_problemIII_aerosol.jl")).read()
    p3 = {k: parse_const_vector(aer, f"PROBLEMIII_{k}")
          for k in ("a1", "b1", "a2", "a3", "b2", "a4")}

    np.savez_compressed(
        OUT,
        scalar_stokes=scalar_I,                      # (36, 5, 2, 6)
        vector_I=vecs["I"], vector_Q=vecs["Q"], vector_U=vecs["U"],
        tau_levels=np.array([0.0, 1.0, 2.5, 22.5, 23.0]),
        sza_deg=np.array([35.0, 67.0, 75.0, 82.0]),
        vza_deg=np.array([10.0, 20.0, 40.0]),
        raz_deg=np.array([0.0, 90.0, 180.0]),
        vec_raz_deg=np.array([10.0, 90.0, 170.0]),
        albedo=0.05,
        height_km=height, molext=molext, molomg=molomg,
        p3_a1=p3["a1"], p3_b1=p3["b1"], p3_a2=p3["a2"],
        p3_a3=p3["a3"], p3_b2=p3["b2"], p3_a4=p3["a4"])
    print("wrote", OUT)
    print("scalar TOA-up task1 geom1-9:", scalar_I[:9, 0, 0, 0])


if __name__ == "__main__":
    main()
