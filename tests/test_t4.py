"""The full quartic T^4 radiation scheme: rank-5 tensor construction,
tendency/Jacobian consistency, and agreement with the dynamic-T scheme in
the linear regime (the dynamic-T tensor is the linearization of T^4 around
the 0-index pattern)."""

import numpy as np
import pytest

from qgs_tpu.params.params import QgParams
from qgs_tpu.inner_products.symbolic import (
    AtmosphericSymbolicInnerProducts, OceanicSymbolicInnerProducts,
)
from qgs_tpu.tensors.qgtensor import QgsTensorT4
from qgs_tpu.ops.contraction import make_tendency_fns
from qgs_tpu.models.numpy_backend import make_numpy_tendencies


@pytest.fixture(scope="module")
def t4_system():
    pars = QgParams({'rr': 287.e0, 'sb': 5.6e-8}, T4=True)
    pars.set_params({'kd': 0.04, 'kdp': 0.04, 'n': 1.5})
    pars.set_atmospheric_channel_fourier_modes(2, 2, mode='symbolic')
    pars.set_oceanic_basin_fourier_modes(2, 4, mode='symbolic')
    aip = AtmosphericSymbolicInnerProducts(pars, quadrature=True)
    oip = OceanicSymbolicInnerProducts(pars, quadrature=True)
    tensor = QgsTensorT4(pars, aip, oip)
    return pars, aip, oip, tensor


def test_t4_tensor_structure(t4_system):
    pars, aip, oip, tensor = t4_system
    assert pars.T4 and pars.dynamic_T
    assert pars.ndim == 38
    assert tensor.tensor.rank == 5
    # T4 has many more quartic entries than the dynamic-T pattern
    quartic = np.sum(tensor.tensor.coords[3] != 0)
    assert quartic > 100


def test_t4_quartic_ip_symmetry(t4_system):
    """z is scattered over all multiset permutations -> fully symmetric in
    its trailing indices."""
    pars, aip, oip, tensor = t4_system
    z = aip._z
    # check a handful of entries for permutation symmetry
    rng = np.random.default_rng(0)
    dense_slices = {}
    for e in rng.integers(0, z.nnz, size=20):
        i, j, k, l, m = z.coords[:, e]
        v = z.data[e]
        # find the sorted-permutation entry
        js, ks, ls, ms = sorted((j, k, l, m))
        mask = np.all(z.coords.T == [i, js, ks, ls, ms], axis=1)
        assert mask.any()
        assert np.isclose(z.data[mask][0], v)


def test_t4_tendencies_consistency(t4_system):
    """JAX gather-scatter rank-5 contraction vs the reference-semantics
    NumPy loop, plus Jacobian vs finite differences."""
    pars, aip, oip, tensor = t4_system
    f_b, jac_b = make_tendency_fns(tensor.tensor, tensor.jacobian_tensor)
    fn, Dfn = make_numpy_tendencies(tensor.tensor, tensor.jacobian_tensor)

    rng = np.random.default_rng(1)
    x = rng.random((2, pars.ndim)) * 0.02
    fx = np.asarray(f_b(0., x))
    for b in range(2):
        ref = fn(0., x[b])
        assert np.allclose(fx[b], ref, rtol=1e-10, atol=1e-12)

    J = np.asarray(jac_b(0., x))
    for b in range(2):
        Jref = Dfn(0., x[b])
        assert np.allclose(J[b], Jref, rtol=1e-10, atol=1e-12)

    eps = 1e-7
    col = 7
    xp = x.copy()
    xp[:, col] += eps
    fd = (np.asarray(f_b(0., xp)) - fx) / eps
    assert np.allclose(J[:, :, col], fd, atol=1e-4)


def test_t4_integration_smoke(t4_system):
    from qgs_tpu.integrators.rk import integrate_runge_kutta
    pars, aip, oip, tensor = t4_system
    f_b, _ = make_tendency_fns(tensor.tensor, tensor.jacobian_tensor)
    rng = np.random.default_rng(2)
    # start near the reference stationary-ish state: small perturbations with
    # reasonable 0-th order temperatures
    x0 = rng.random(pars.ndim) * 0.01
    vr = pars.variables_range
    x0[vr[0]] = 0.1      # T_a0
    x0[vr[2]] = 0.12     # T_o0
    t, y = integrate_runge_kutta(f_b, 0., 10., 0.01, x0, write_steps=0)
    assert np.all(np.isfinite(np.asarray(y)))


def test_dynamic_t_analytic_ips_rejected():
    """dynamic_T/T4 with analytic (wavenumber-block) inner products must be
    rejected with a clear error: the analytic closed forms carry no quartic
    coefficients (the reference's accessors are silent no-ops,
    ref ``qgs/inner_products/analytic.py:432-436``, and it crashes deep in
    tensor assembly instead)."""
    from qgs_tpu.models.tendencies import create_tendencies

    pars = QgParams(dynamic_T=True)
    pars.set_atmospheric_channel_fourier_modes(2, 2)   # analytic blocks
    pars.set_oceanic_basin_fourier_modes(2, 4)
    pars.set_params({'kd': 0.04, 'kdp': 0.04, 'n': 1.5})
    with pytest.raises(ValueError, match="symbolic"):
        create_tendencies(pars)


def test_t4_direct_tangent(t4_system):
    """The direct tangent contraction must handle rank-5 Jacobian tensors
    (multiple trailing state gathers) — the path the Lyapunov toolbox uses
    for dynamic-T/T4 models."""
    import jax.numpy as jnp
    from qgs_tpu.ops.contraction import make_direct_tangent

    pars, aip, oip, tensor = t4_system
    _, jac_b = make_tendency_fns(tensor.tensor, tensor.jacobian_tensor)

    rng = np.random.default_rng(3)
    B, n = 3, pars.ndim
    x = rng.random((B, n)) * 0.05
    xx = np.concatenate([np.ones((B, 1)), x], axis=1)
    dm = rng.standard_normal((B, n, 5))

    hom = make_direct_tangent(tensor.jacobian_tensor)
    got = np.asarray(hom(jnp.asarray(xx), jnp.asarray(dm)))
    J = np.asarray(jac_b(0., jnp.asarray(x)))
    ref = np.einsum('bnm,bmt->bnt', J, dm)
    assert np.abs(got - ref).max() < 1e-11, np.abs(got - ref).max()
