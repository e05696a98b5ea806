"""EDM diffusion parameterization (Karras et al., "Elucidating...", 2022).

Functional rebuild of the reference's diff_params layer (diff_params/shared.py
+ diff_params/edm.py): preconditioning scalars cin/cout/cskip/cnoise, the
rho-warped training-time sigma sampler, Tweedie<->score conversions, the
probability-flow ODE integrand, and the training loss — all as pure functions
of explicit inputs (params, rng, batch) so they compose under jit/grad/scan.

The network convention matches the reference denoiser (shared.py:98-120):
``D(x, sigma) = cskip*x + cout*net(cin*x, cnoise)``.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


def _bcast(sigma: jax.Array, ndim: int) -> jax.Array:
    """Broadcast per-batch sigma (B,) to (B, 1, 1, ...) with `ndim` dims."""
    return sigma.reshape(sigma.shape + (1,) * (ndim - sigma.ndim))


class EDM:
    """EDM hyperparameters + pure-function API.

    Constructed from conf/diff_params/edm_VCTK.yaml schema: pass ``sde_hp``
    with sigma_data/sigma_min/sigma_max/rho (diff_params/edm.py:13-22).
    """

    def __init__(self, type: str = "ve_karras", sde_hp: Any = None, **kwargs):
        hp = sde_hp or {}
        self.type = type
        self.sigma_data = float(hp.get("sigma_data", 0.05))
        self.sigma_min = float(hp.get("sigma_min", 1e-5))
        self.sigma_max = float(hp.get("sigma_max", 10.0))
        self.rho = float(hp.get("rho", 10.0))

    @property
    def sde_hp(self):
        return {"sigma_data": self.sigma_data, "sigma_min": self.sigma_min,
                "sigma_max": self.sigma_max, "rho": self.rho}

    # --- preconditioning (edm.py:44-81) ---
    def cskip(self, sigma):
        return self.sigma_data ** 2 / (sigma ** 2 + self.sigma_data ** 2)

    def cout(self, sigma):
        return sigma * self.sigma_data * jax.lax.rsqrt(self.sigma_data ** 2 + sigma ** 2)

    def cin(self, sigma):
        return jax.lax.rsqrt(self.sigma_data ** 2 + sigma ** 2)

    def cnoise(self, sigma):
        return 0.25 * jnp.log(sigma)

    def lambda_w(self, sigma):
        return (sigma * self.sigma_data) ** -2 * (self.sigma_data ** 2 + sigma ** 2)

    # --- mean/std of the VE-Karras perturbation kernel (edm.py:89-93) ---
    def _mean(self, x, t):
        return x

    def _std(self, t):
        return t

    # --- Tweedie/score conversions (edm.py:83-87) ---
    def tweedie_to_score(self, tweedie, xt, t):
        t = _bcast(jnp.asarray(t, xt.dtype).reshape(-1), xt.ndim)
        return (tweedie - xt) / t ** 2

    def score_to_tweedie(self, score, xt, t):
        t = _bcast(jnp.asarray(t, xt.dtype).reshape(-1), xt.ndim)
        return t ** 2 * score + xt

    # torch-named aliases for API familiarity with the reference
    Tweedie2score = tweedie_to_score
    score2Tweedie = score_to_tweedie

    def ode_integrand(self, x, t, score):
        """Probability-flow ODE dx/dt = -t * score (edm.py:95)."""
        t = _bcast(jnp.asarray(t, x.dtype).reshape(-1), x.ndim)
        return -t * score

    _ode_integrand = ode_integrand

    # --- training-time sigma sampling (edm.py:24-33) ---
    def sample_time_training(self, rng: jax.Array, n: int) -> jax.Array:
        a = jax.random.uniform(rng, (n,))
        smin, smax, rho = self.sigma_min, self.sigma_max, self.rho
        return (smax ** (1 / rho) + a * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho

    def sample_prior(self, rng: jax.Array, shape) -> jax.Array:
        return jax.random.normal(rng, shape)

    # --- denoiser wrapper (shared.py:98-120) ---
    def denoiser(self, xn: jax.Array, net: Callable, t) -> jax.Array:
        """Apply the preconditioned network: cskip*x + cout*net(cin*x, cnoise).

        Args:
            xn: (B, ...) noisy input at noise level t.
            net: callable(x, cnoise)->x̂ (the score U-Net apply fn).
            t: scalar or (B,) noise level.
        """
        t = jnp.asarray(t, xn.dtype).reshape(-1)
        if t.shape[0] == 1 and xn.shape[0] != 1:
            t = jnp.broadcast_to(t, (xn.shape[0],))
        sigma = _bcast(self._std(t), xn.ndim)
        cnoise = self.cnoise(self._std(t))
        return self.cskip(sigma) * xn + self.cout(sigma) * net(self.cin(sigma) * xn, cnoise)

    # --- training loss (shared.py:123-159) ---
    def prepare_train_preconditioning(self, x, t, n):
        sigma = _bcast(self._std(t), x.ndim)
        x_perturbed = self._mean(x, t) + sigma * n
        cin, cout, cskip = self.cin(sigma), self.cout(sigma), self.cskip(sigma)
        cnoise = self.cnoise(self._std(t))
        target = (x - cskip * x_perturbed) / cout
        return cin * x_perturbed, target, cnoise

    def loss_fn(self, net: Callable, rng: jax.Array, x: jax.Array,
                n: jax.Array | None = None) -> Tuple[jax.Array, jax.Array]:
        """Per-element squared denoising error and the sampled sigmas.

        Matches shared.py:146-159: the trainer takes error.mean() with NO
        lambda_w weighting (training/trainer.py:232-234).
        """
        rng_t, rng_n = jax.random.split(rng)
        t = self.sample_time_training(rng_t, x.shape[0])
        if n is None:
            n = self.sample_prior(rng_n, x.shape)
        inp, target, cnoise = self.prepare_train_preconditioning(x, t, n)
        estimate = net(inp, cnoise)
        error = (estimate - target) ** 2
        return error, self._std(t)
