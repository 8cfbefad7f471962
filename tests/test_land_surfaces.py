"""RPV and Ross-Li land-surface BRDF tests + shipped-config smoke runs."""

import os

import numpy as np
import pytest

from vsmartmom_tpu.surfaces.land_brdf import (RPVSurface, RossLiSurface,
                                              rossli_reflectance,
                                              rpv_reflectance)


class TestRPV:
    surf = RPVSurface(rho0=0.12, rho_c=0.08, k=0.75, theta=-0.25)

    def test_positive_and_finite(self):
        mu = np.linspace(0.05, 1.0, 20)
        rho = rpv_reflectance(self.surf, mu[:, None], mu[None, :], 0.7)
        assert np.all(np.isfinite(rho)) and np.all(rho > 0)

    def test_reciprocity(self):
        a = rpv_reflectance(self.surf, 0.3, 0.8, 1.1)
        b = rpv_reflectance(self.surf, 0.8, 0.3, 1.1)
        assert np.isclose(a, b, rtol=1e-12)

    def test_hotspot_backscatter(self):
        """theta < 0 (RAMI convention) brightens the backscatter direction
        (dphi = pi in vSmartMOM convention = sun behind viewer)."""
        back = rpv_reflectance(self.surf, 0.6, 0.6, np.pi)
        fwd = rpv_reflectance(self.surf, 0.6, 0.6, 0.0)
        assert back > fwd


class TestRossLi:
    surf = RossLiSurface(f_vol=0.05, f_geo=0.03, f_iso=0.10)

    def test_iso_only_flat(self):
        s = RossLiSurface(f_vol=0.0, f_geo=0.0, f_iso=0.25)
        mu = np.linspace(0.1, 1.0, 10)
        rho = rossli_reflectance(s, mu[:, None], mu[None, :], 1.0)
        assert np.allclose(rho, 0.25)

    def test_finite_kernels(self):
        mu = np.linspace(0.05, 1.0, 20)
        phi = np.linspace(0, np.pi, 7)
        rho = rossli_reflectance(self.surf, mu[:, None, None],
                                 mu[None, :, None], phi[None, None, :])
        assert np.all(np.isfinite(rho))


@pytest.mark.parametrize("cfg", ["vegetation_rpv", "vegetation_rossli",
                                 "lambertian_land"])
def test_shipped_config_runs(cfg):
    from vsmartmom_tpu import (model_from_parameters, parameters_from_yaml,
                               rt_run)
    path = f"/root/reference/config/{cfg}.yaml"
    if not os.path.exists(path):
        pytest.skip("config missing")
    model = model_from_parameters(parameters_from_yaml(path))
    R, T = rt_run(model)
    assert np.all(np.isfinite(R)) and np.all(R[:, 0, :] > 0)
    # distinct viewing angles give distinct radiances for a BRDF surface
    assert len(np.unique(np.round(R[:, 0, 0], 10))) > 1
