"""EDM preconditioning / schedule tests (closed-form + reference-formula parity)."""

import numpy as np
import jax
import jax.numpy as jnp

from buddy_tpu.diffusion.edm import EDM
from buddy_tpu.sampling.schedule import create_schedule, get_gamma

EDM_KW = dict(sde_hp={"sigma_data": 0.05, "sigma_min": 1e-5, "sigma_max": 10, "rho": 10})


def test_preconditioning_identities():
    edm = EDM(**EDM_KW)
    sigma = jnp.asarray([1e-4, 0.01, 0.05, 0.3, 5.0])
    sd = edm.sigma_data
    # EDM paper identities
    np.testing.assert_allclose(edm.cskip(sigma), sd**2 / (sigma**2 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(edm.cout(sigma), sigma * sd / np.sqrt(sd**2 + sigma**2), rtol=1e-5)
    np.testing.assert_allclose(edm.cin(sigma), 1 / np.sqrt(sd**2 + sigma**2), rtol=1e-5)
    np.testing.assert_allclose(edm.cnoise(sigma), 0.25 * np.log(sigma), rtol=1e-6)
    # variance-preserving input scaling: cin^2*(sigma^2+sd^2) == 1
    np.testing.assert_allclose(edm.cin(sigma)**2 * (sigma**2 + sd**2), 1.0, rtol=1e-5)
    # cskip^2 + cout^2/sd^2 * ... boundary: cout^2 = sigma^2 sd^2/(sigma^2+sd^2)
    np.testing.assert_allclose(edm.cout(sigma)**2 * edm.lambda_w(sigma), 1.0, rtol=1e-5)


def test_tweedie_score_roundtrip(rng):
    edm = EDM(**EDM_KW)
    x = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
    tw = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
    t = jnp.asarray([0.3, 0.7])
    score = edm.tweedie_to_score(tw, x, t)
    back = edm.score_to_tweedie(score, x, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(tw), atol=1e-5)
    # VE: score = (tweedie - x)/t^2, ODE integrand = -t*score
    np.testing.assert_allclose(np.asarray(score), (np.asarray(tw) - np.asarray(x)) / np.asarray(t)[:, None]**2, rtol=1e-4)
    d = edm.ode_integrand(x, t, score)
    np.testing.assert_allclose(np.asarray(d), -np.asarray(t)[:, None] * np.asarray(score), rtol=1e-5)


def test_sample_time_training_range():
    edm = EDM(**EDM_KW)
    t = np.asarray(edm.sample_time_training(jax.random.PRNGKey(0), 4096))
    assert t.min() >= edm.sigma_min * 0.999
    assert t.max() <= edm.sigma_max * 1.001
    # rho-warp: u = (t^(1/rho)-smax^(1/rho))/(smin^(1/rho)-smax^(1/rho)) ~ U[0,1]
    u = (t ** (1 / edm.rho) - edm.sigma_max ** (1 / edm.rho)) / (
        edm.sigma_min ** (1 / edm.rho) - edm.sigma_max ** (1 / edm.rho))
    assert 0.4 < u.mean() < 0.6


def test_denoiser_preconditioning(rng):
    """denoiser == cskip*x + cout*net(cin*x, cnoise) (shared.py:98-120)."""
    edm = EDM(**EDM_KW)
    x = jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32))
    t = jnp.asarray([0.1, 0.2, 0.5])

    calls = {}
    def net(inp, cnoise):
        calls["inp"] = inp
        calls["cnoise"] = cnoise
        return 2.0 * inp

    out = edm.denoiser(x, net, t)
    sig = np.asarray(t)[:, None]
    ref = (edm.cskip(sig) * np.asarray(x)
           + edm.cout(sig) * 2.0 * edm.cin(sig) * np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(calls["cnoise"]), 0.25 * np.log(np.asarray(t)), rtol=1e-5)


def test_loss_fn_target_identity(rng):
    """With a perfect denoiser net, the loss target satisfies
    cskip*x_pert + cout*target == x (EDM boundary condition)."""
    edm = EDM(**EDM_KW)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32) * 0.05)
    key = jax.random.PRNGKey(1)
    t = edm.sample_time_training(key, 4)
    n = edm.sample_prior(jax.random.PRNGKey(2), x.shape)
    inp, target, cnoise = edm.prepare_train_preconditioning(x, t, n)
    sig = np.asarray(t)[:, None]
    x_pert = np.asarray(x) + sig * np.asarray(n)
    np.testing.assert_allclose(np.asarray(inp), edm.cin(sig) * x_pert, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        edm.cskip(sig) * x_pert + edm.cout(sig) * np.asarray(target),
        np.asarray(x), rtol=1e-3, atol=1e-5)


def test_schedule_reference_parity():
    """Schedule values match Sampler.py:52-56 exactly (incl. the /(T-1) warp
    and t[-1]=0 overwrite)."""
    T, smin, smax, rho = 201, 1e-4, 0.5, 10.0
    t = np.asarray(create_schedule(T, sigma_min=smin, sigma_max=smax, rho=rho))
    a = np.arange(0, T + 1)
    ref = (smax ** (1 / rho) + a / (T - 1) * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
    ref[-1] = 0
    assert t.shape == (T + 1,)
    np.testing.assert_allclose(t, ref.astype(np.float32), rtol=1e-5)
    assert t[0] == np.float32(smax)
    np.testing.assert_allclose(t[T - 1], smin, rtol=1e-4)
    assert t[-1] == 0.0


def test_gamma_reference_parity():
    t = create_schedule(201, sigma_min=1e-4, sigma_max=0.5, rho=10)
    g = np.asarray(get_gamma(t, Schurn=50, Stmin=0, Stmax=10))
    base = min(50 / 202, 2 ** 0.5 - 1)
    # active where 0 < t < 10 -> all but the final 0 entry
    assert np.allclose(g[:-1], base)
    assert g[-1] == 0.0
