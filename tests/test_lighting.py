"""Tests for SH and SG lighting: closed-form cases + numeric integration.

The reference validates SG lighting against golden renders
(tests/samples/render/sg); here the SG inner products are validated
against direct numerical integration over the sphere — a stronger,
implementation-independent check.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.lighting import sh as sh_mod
from kaolin_tpu.render.lighting import sg as sg_mod
from kaolin_tpu.render.mesh.utils import spherical_harmonic_lighting


def fibonacci_sphere(n=100000):
    """Quasi-uniform unit sphere samples (for 1/n-weighted integration)."""
    i = np.arange(n, dtype=np.float64)
    phi = math.pi * (3. - math.sqrt(5.)) * i
    z = 1. - 2. * (i + 0.5) / n
    r = np.sqrt(1. - z * z)
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1)


# ---------------------------------------------------------------------------
# spherical harmonics

def test_project_onto_sh9_shape_and_band0():
    dirs = jnp.asarray(fibonacci_sphere(64).astype(np.float32))
    bands = sh_mod.project_onto_sh9(dirs)
    assert bands.shape == (64, 9)
    np.testing.assert_allclose(np.asarray(bands[:, 0]), 0.28209479177,
                               rtol=1e-6)


def test_project_onto_sh9_accepts_list():
    bands = sh_mod.project_onto_sh9([0., 0., 1.])
    assert bands.shape == (9,)
    np.testing.assert_allclose(float(bands[2]), 0.4886025119, rtol=1e-6)


def test_sh9_basis_orthonormal():
    """Monte-Carlo check: int Y_i Y_j dw = delta_ij (the defining property
    of the real SH basis the coefficients encode)."""
    pts = fibonacci_sphere(200000).astype(np.float32)
    bands = np.asarray(sh_mod.project_onto_sh9(jnp.asarray(pts)))
    gram = bands.T @ bands * (4. * math.pi / pts.shape[0])
    np.testing.assert_allclose(gram, np.eye(9), atol=2e-2)


def test_sh9_irradiance_constant_light():
    """A pure-DC radiance lobe gives the same irradiance for any normal."""
    lights = jnp.zeros((9,)).at[0].set(1.)
    normals = jnp.asarray(fibonacci_sphere(32).astype(np.float32))
    irr = sh_mod.sh9_irradiance(lights, normals)
    expected = math.pi * 0.28209479177
    np.testing.assert_allclose(np.asarray(irr), expected, rtol=1e-5)


def test_sh9_irradiance_vs_numeric_cosine_integral():
    """Compare against the true convolution integral
    E(n) = int_{H(n)} L(w) (n.w) dw for an SH-1 light."""
    lights = np.zeros(9, np.float32)
    lights[0] = 0.8
    lights[2] = 0.5   # z band
    normal = np.array([[0., 0., 1.]], np.float32)
    irr = float(sh_mod.sh9_irradiance(jnp.asarray(lights),
                                      jnp.asarray(normal))[0])
    w = fibonacci_sphere(400000)
    L = np.asarray(sh_mod.project_onto_sh9(
        jnp.asarray(w.astype(np.float32)))) @ lights
    cos = np.clip(w[:, 2], 0., None)
    numeric = (L * cos).sum() * (4. * math.pi / w.shape[0])
    # the 9-band clamped-cosine kernel is itself an approximation (exact
    # through band 2 up to the standard A_l coefficients)
    np.testing.assert_allclose(irr, numeric, rtol=2e-2)


def test_sh9_diffuse_scales_with_albedo():
    normals = jnp.asarray(fibonacci_sphere(16).astype(np.float32))
    albedo = jnp.ones((16, 3)) * jnp.asarray([1., 0.5, 0.25])
    out = sh_mod.sh9_diffuse(jnp.asarray([0., 0., 1.]), normals, albedo)
    assert out.shape == (16, 3)
    np.testing.assert_allclose(np.asarray(out[:, 1]),
                               np.asarray(out[:, 0]) * 0.5, rtol=1e-5)


def test_spherical_harmonic_lighting_dc_term():
    normals = jnp.asarray(
        fibonacci_sphere(64).astype(np.float32)).reshape(1, 8, 8, 3)
    lights = jnp.zeros((1, 9)).at[0, 0].set(2.)
    out = spherical_harmonic_lighting(normals, lights)
    assert out.shape == (1, 8, 8)
    np.testing.assert_allclose(np.asarray(out), 2. * 0.28209479177,
                               rtol=1e-6)


def test_spherical_harmonic_lighting_linear_in_lights():
    rng = np.random.RandomState(0)
    normals = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
    l1 = jnp.asarray(rng.randn(1, 9).astype(np.float32))
    l2 = jnp.asarray(rng.randn(1, 9).astype(np.float32))
    out = spherical_harmonic_lighting(normals, l1 + l2)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(spherical_harmonic_lighting(normals, l1)
                   + spherical_harmonic_lighting(normals, l2)),
        rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# spherical gaussians

def _sg_eval(amp, direction, sharpness, w):
    """G(w) = amp * exp(sharpness * (dot(direction, w) - 1))."""
    d = (direction[None] * w[:, None]).sum(-1)          # (N, S)
    return amp[None] * np.exp(sharpness[None] * (d - 1.))[..., None]


def test_unbatched_sg_inner_product_vs_numeric():
    rng = np.random.RandomState(1)
    S, O = 3, 2
    a = rng.rand(S, 3).astype(np.float32) + 0.1
    d = rng.randn(S, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    lam = (rng.rand(S).astype(np.float32) * 8. + 2.)
    oa = rng.rand(O, 3).astype(np.float32) + 0.1
    od = rng.randn(O, 3).astype(np.float32)
    od /= np.linalg.norm(od, axis=-1, keepdims=True)
    olam = (rng.rand(O).astype(np.float32) * 8. + 2.)

    out = np.asarray(sg_mod.unbatched_sg_inner_product(
        jnp.asarray(a), jnp.asarray(d), jnp.asarray(lam),
        jnp.asarray(oa), jnp.asarray(od), jnp.asarray(olam)))
    assert out.shape == (S, O, 3)

    w = fibonacci_sphere(400000)
    dw = 4. * math.pi / w.shape[0]
    g1 = _sg_eval(a, d, lam, w)          # (N, S, 3)
    g2 = _sg_eval(oa, od, olam, w)       # (N, O, 3)
    numeric = np.einsum('nsc,noc->soc', g1, g2) * dw
    np.testing.assert_allclose(out, numeric, rtol=2e-2, atol=1e-4)


def test_unbatched_reduced_matches_sum():
    rng = np.random.RandomState(2)
    args = []
    for n in (4, 5):
        amp = jnp.asarray(rng.rand(n, 3).astype(np.float32))
        d = rng.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        args += [amp, jnp.asarray(d),
                 jnp.asarray(rng.rand(n).astype(np.float32) * 5. + 1.)]
    full = sg_mod.unbatched_sg_inner_product(*args)
    reduced = sg_mod.unbatched_reduced_sg_inner_product(*args)
    np.testing.assert_allclose(np.asarray(reduced),
                               np.asarray(full.sum(1)), rtol=1e-5)


def test_approximate_sg_integral_vs_numeric():
    amp = jnp.asarray([[1., 2., 3.]])
    lam = jnp.asarray([20.])
    approx = np.asarray(sg_mod.approximate_sg_integral(amp, lam))
    # exact: 2 pi a (1 - e^(-2 lam)) / lam ~= 2 pi a / lam for lam >> 1
    exact = 2. * math.pi * np.asarray(amp) * (
        1. - math.exp(-2. * 20.)) / 20.
    np.testing.assert_allclose(approx, exact, rtol=1e-5)


def test_cosine_lobe_sg_approximates_clamped_cosine():
    n = np.array([0., 0., 1.], np.float32)
    amp, d, lam = sg_mod.cosine_lobe_sg(jnp.asarray(n[None]))
    w = fibonacci_sphere(200000)
    g = _sg_eval(np.asarray(amp), np.asarray(d), np.asarray(lam), w)[:, 0, 0]
    cos = np.clip(w[:, 2], 0., None)
    dw = 4. * math.pi / w.shape[0]
    # the (1.17, 2.133) fit tracks the clamped-cosine shape; its total
    # integral runs ~8% hot, and pointwise error stays below ~0.18
    np.testing.assert_allclose((g * dw).sum(), (cos * dw).sum(), rtol=0.1)
    upper = w[:, 2] > 0.
    assert np.abs(g[upper] - cos[upper]).max() < 0.2


def test_fresnel_limits():
    spec = jnp.asarray([[0.04, 0.04, 0.04]])
    head_on = sg_mod.fresnel(jnp.asarray([[1.]]), spec)
    np.testing.assert_allclose(np.asarray(head_on), 0.04, rtol=1e-6)
    grazing = sg_mod.fresnel(jnp.asarray([[0.]]), spec)
    np.testing.assert_allclose(np.asarray(grazing), 1., rtol=1e-6)


def test_sg_warp_distribution_reflects():
    normal = jnp.asarray([[0., 0., 1.]])
    view = jnp.asarray([[np.sin(0.3), 0., np.cos(0.3)]], dtype=jnp.float32)
    amp, d, lam = sg_mod.sg_distribution_term(normal, jnp.asarray([0.5]))
    wamp, wd, wlam = sg_mod.sg_warp_distribution(amp, d, lam, view)
    # warped lobe direction = reflect(-view, normal)
    #   = -view + 2 (view . n) n = (-sin, 0, cos)
    expected = np.array([-np.sin(0.3), 0., np.cos(0.3)])
    np.testing.assert_allclose(np.asarray(wd[0]), expected, atol=1e-6)
    assert float(wlam[0]) == pytest.approx(
        float(lam[0]) / (4. * math.cos(0.3)), rel=1e-4)


def test_sg_irradiance_fitted_positive_and_shape():
    rng = np.random.RandomState(3)
    S, N = 4, 10
    amp = jnp.asarray(rng.rand(S, 3).astype(np.float32))
    d = rng.randn(S, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    lam = jnp.asarray(rng.rand(S).astype(np.float32) * 10. + 1.)
    n = rng.randn(N, 3).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    out = sg_mod.sg_irradiance_fitted(amp, jnp.asarray(d), lam,
                                      jnp.asarray(n))
    assert out.shape == (N, S, 3)


def test_sg_diffuse_inner_vs_fitted_consistent():
    """Both irradiance estimators approximate the same integral; they
    should agree within the fits' error for a moderately sharp light."""
    amp = jnp.asarray([[1., 1., 1.]])
    d = jnp.asarray([[0., 0., 1.]])
    lam = jnp.asarray([8.])
    n = jnp.asarray([[0., 0., 1.], [0., 1., 0.]])
    albedo = jnp.ones((2, 3))
    fitted = sg_mod.sg_diffuse_fitted(amp, d, lam, n, albedo)
    inner = sg_mod.sg_diffuse_inner_product(amp, d, lam, n, albedo)
    np.testing.assert_allclose(np.asarray(fitted), np.asarray(inner),
                               atol=0.06)


def test_sg_warp_specular_term_shape_and_nonneg():
    rng = np.random.RandomState(5)
    N, S = 6, 3
    amp = jnp.asarray(rng.rand(S, 3).astype(np.float32))
    d = rng.randn(S, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    lam = jnp.asarray(rng.rand(S).astype(np.float32) * 5. + 1.)
    normal = np.tile(np.array([[0., 0., 1.]], np.float32), (N, 1))
    view = rng.randn(N, 3).astype(np.float32)
    view[:, 2] = np.abs(view[:, 2]) + 0.5
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    out = sg_mod.sg_warp_specular_term(
        amp, jnp.asarray(d), lam, jnp.asarray(normal),
        jnp.asarray(rng.rand(N).astype(np.float32) * 0.5 + 0.1),
        jnp.asarray(view), jnp.ones((N, 3)) * 0.04)
    assert out.shape == (N, 3)
    assert float(out.min()) >= 0.
