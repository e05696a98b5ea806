"""Karras stochastic Euler–Heun sampler as a single jitted lax.scan.

Parity target: testing/Sampler.py + testing/EulerHeunSampler.py.  Where the
reference runs a per-step Python loop with tqdm (EulerHeunSampler.py:90-93),
the whole T-step reverse diffusion here compiles into one ``jax.lax.scan``
program — zero host round-trips, the single biggest TPU win over the
reference design (SURVEY.md §7).

Behavior notes carried over from the reference:
* ``stochastic_timestep`` always uses Snoise=1 — the configured Snoise is
  never forwarded (EulerHeunSampler.py:50 calls it without the argument).
* second-order correction is skipped when t_{i+1} == 0 (only the final
  step), implemented with ``lax.cond`` so only one branch executes.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from buddy_tpu.sampling.schedule import create_schedule, get_gamma


class Sampler:
    """Base sampler: owns the model, diff params, and config.

    ``model`` is either a plain callable ``(x, cnoise) -> x̂`` (tests, mock
    denoisers) or a ``NetworkBundle`` (flax module + params); with a bundle,
    the params are threaded explicitly through the jitted sampling program so
    checkpoint reloads don't trigger recompilation.
    """

    def __init__(self, model: Callable, diff_params, args):
        self.model = model
        self.diff_params = diff_params
        self.args = args
        sp = args["tester"]["sampling_params"]
        self.sde_hp = (diff_params.sde_hp if sp["same_as_training"]
                       else dict(sp["sde_hp"]))
        self.T = int(sp["T"])
        self.schedule_kind = sp.get("schedule", "edm")
        self._jit_cache: dict = {}

    @property
    def _is_bundle(self) -> bool:
        return hasattr(self.model, "module")

    def net_params(self):
        return self.model.params if self._is_bundle else ()

    def _net_fn(self, params) -> Callable:
        if self._is_bundle:
            return lambda x, cnoise: self.model.module.apply(params, x, cnoise)
        return self.model

    def create_schedule(self, sigma_min=None, sigma_max=None, rho=None, T=None):
        hp = self.sde_hp
        return create_schedule(
            T if T is not None else self.T,
            sigma_min=float(sigma_min if sigma_min is not None else hp["sigma_min"]),
            sigma_max=float(sigma_max if sigma_max is not None else hp["sigma_max"]),
            rho=float(rho if rho is not None else hp["rho"]),
            schedule=self.schedule_kind)

    def get_tweedie_estimate(self, x: jax.Array, t_i, params=()) -> jax.Array:
        """denoiser() on a (B, T) waveform (Sampler.py:70-72)."""
        net = self._net_fn(params)
        return self.diff_params.denoiser(x[:, None, :], net, t_i)[:, 0, :]

    def tweedie_to_score(self, tweedie, xt, t):
        return self.diff_params.tweedie_to_score(tweedie, xt, t)


class NoSampler(Sampler):
    """Stub sampler (Sampler.py:74-86)."""

    def predict(self, *a, **k):
        return None

    predict_unconditional = predict
    predict_conditional = predict
    step = predict


class EulerHeunSampler(Sampler):
    """Unconditional Euler–Heun sampler (EulerHeunSampler.py)."""

    def __init__(self, model, diff_params, args):
        super().__init__(model, diff_params, args)
        sp = args["tester"]["sampling_params"]
        self.Schurn = float(sp["Schurn"])
        self.Snoise = float(sp["Snoise"])
        self.Stmin = float(sp["Stmin"])
        self.Stmax = float(sp["Stmax"])
        self.order = int(sp["order"])

    def get_gamma(self, t):
        return get_gamma(t, Schurn=self.Schurn, Stmin=self.Stmin, Stmax=self.Stmax)

    # ------------------------------------------------------------------
    def _denoise(self, x, t, params=()):
        return self.get_tweedie_estimate(x, t, params)

    def _scan_step(self, carry, inp, params=()):
        """One reverse-diffusion step (EulerHeunSampler.py:47-72)."""
        x, rng = carry
        t_i, t_ip1, gamma_i = inp
        rng, k_eps = jax.random.split(rng)

        t_hat = t_i + gamma_i * t_i
        eps = jax.random.normal(k_eps, x.shape, x.dtype)  # Snoise=1 (see module docstring)
        x_hat = x + jnp.sqrt(jnp.maximum(t_hat ** 2 - t_i ** 2, 0.0)) * eps

        x_den = self._denoise(x_hat, t_hat, params)
        d = (x_hat - x_den) / t_hat          # -t*score for VE
        dt = t_ip1 - t_hat
        x_euler = x_hat + dt * d

        if self.order == 2:
            def second_order(_):
                x_prime = x_euler
                x_den2 = self._denoise(x_prime, t_ip1, params)
                d2 = (x_prime - x_den2) / t_ip1
                return x_hat + dt * 0.5 * (d + d2), x_den2

            def first_order(_):
                return x_euler, x_den

            x_next, x_den = jax.lax.cond(t_ip1 != 0.0, second_order, first_order, None)
        else:
            x_next = x_euler
        return (x_next, rng), None

    def _run(self, shape, sharding, params, rng):
        t = self.create_schedule()
        gamma = self.get_gamma(t)
        rng, k_init = jax.random.split(rng)
        x = t[0] * jax.random.normal(k_init, shape)
        if sharding is not None:  # shard the sample batch over the dp mesh
            x = jax.lax.with_sharding_constraint(x, sharding)
        inputs = (t[:-1], t[1:], gamma[:-1])
        step = lambda c, i: self._scan_step(c, i, params)
        (x, _), _ = jax.lax.scan(step, (x, rng), inputs)
        return x

    def predict(self, shape, rng=None, blind: bool = False, sharding=None):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        key = ("uncond", tuple(shape), sharding)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(partial(self._run, tuple(shape), sharding))
        return self._jit_cache[key](self.net_params(), rng)

    def predict_unconditional(self, shape, rng=None, sharding=None, **_):
        return self.predict(shape, rng=rng, sharding=sharding)

    def predict_conditional(self, *args, **kwargs):
        raise NotImplementedError
