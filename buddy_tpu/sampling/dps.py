"""Diffusion posterior sampling (informed + blind dereverberation).

Parity target: testing/EulerHeunSamplerDPS.py — the flagship BUDDy loop.

The reference mutates operator parameters in-place inside a Python loop
(10 Adam updates of the subband filter per diffusion step, then likelihood
guidance through the U-Net).  Here the entire T-step loop, including the
inner operator optimization, compiles into one ``jax.lax.scan`` whose carry
is ``(x, rng, op_params, adam_state, H)`` — the TPU-native formulation of
SURVEY.md §7 hard part #1.

Key behavioral equivalences:
* likelihood score: grad of rec_loss(y, A(D(x_hat))) wrt x_hat, computed as
  vjp through the denoiser of the operator-side gradient — one U-Net forward
  + one backward per step, same cost split as the reference (:61-69).
* The H used for guidance is the one computed at the start of the *last*
  inner iteration (from params after op_updates_per_step-1 updates), exactly
  matching the reference's update-then-step ordering (:76-113).
* ``x_den`` is rescaled to sigma_data before the score (but after guidance)
  when constraint_speech_magnitude.use (:127-131), and ``predict`` returns
  x_den rather than x (:159-178).
* std() uses Bessel's correction like torch.Tensor.std.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from buddy_tpu.losses import get_loss
from buddy_tpu.sampling.euler_heun import EulerHeunSampler


def _std(x):
    return jnp.std(x, ddof=1)


class EulerHeunSamplerDPS(EulerHeunSampler):
    """Euler-Heun sampler with DPS likelihood guidance (informed + blind)."""

    def __init__(self, model, diff_params, args):
        super().__init__(model, diff_params, args)
        ps = args["tester"]["posterior_sampling"]
        self.ps = ps
        self.zeta = float(ps["zeta"])
        # "full" = exact DPS vjp through the denoiser (reference parity);
        # "identity" = MPGD/PiGDM-style dD/dx ~= I approximation that skips
        # the U-Net backward — roughly half the per-step FLOPs.  The
        # grad-norm zeta normalization below makes the step size
        # self-calibrating under either Jacobian.
        self.guidance_jacobian = str(ps.get("guidance_jacobian", "full"))
        assert self.guidance_jacobian in ("full", "identity"), \
            self.guidance_jacobian
        self.audio_len = int(args["exp"]["audio_len"])
        self.y_stft = None
        # prepared (loss-transformed) observation spectra, set by _run;
        # None means fall back to y_stft/y (direct _scan_step callers, tests)
        self._y_prep = None
        self._y_prep_params = None

    # ------------------------------------------------------------------
    # warm initialization (EulerHeunSamplerDPS.py:25-59)
    # ------------------------------------------------------------------
    def initialize_x(self, y, shape, rng, t0):
        wi = self.ps["warm_initialization"]
        mode = wi["mode"]
        noise = t0 * jax.random.normal(rng, shape)
        if mode == "none":
            return noise
        if mode == "reverb_scaled":
            return float(wi["scaling_factor"]) * y / _std(y) + noise
        if mode == "wpe_scaled":
            from buddy_tpu.sampling.wpe import wpe_dereverb
            w = wi["wpe"]
            x_pred = wpe_dereverb(y, taps=int(w["taps"]), delay=int(w["delay"]),
                                  iterations=int(w["iterations"]))
            x_pred = x_pred[..., : y.shape[-1]]
            x_pred = float(wi["scaling_factor"]) * x_pred / _std(x_pred)
            return x_pred + noise
        raise NotImplementedError(mode)

    # ------------------------------------------------------------------
    # the jitted sampling program
    # ------------------------------------------------------------------
    def _build_losses(self, operator, blind):
        ps = self.ps
        self.rec_loss = get_loss(ps["rec_loss"], operator=operator)
        self.rec_loss_params = None
        self.reg_loss = None
        if blind:
            self.rec_loss_params = get_loss(ps["rec_loss_params"], operator=operator)
            reg_cfg = ps.get("RIR_noise_regularization", None)
            # the reference never reads the ``use`` key: the reg loss is
            # active iff loss.name != "none" (EulerHeunSamplerDPS.py:95,199;
            # get_loss returns None for "none") — match that exactly
            if reg_cfg is not None:
                self.reg_loss = get_loss(reg_cfg["loss"], operator=operator)
                if self.reg_loss is not None:
                    self.reg_sigma_min = float(reg_cfg["crop_sigma_min"])
                    self.reg_sigma_max = float(reg_cfg["crop_sigma_max"])

    def _make_opt(self):
        bh = self.ps["blind_hp"]
        assert bh.get("optimizer", "adam") == "adam"
        return optax.adam(learning_rate=float(bh["lr_op"]),
                          b1=float(bh["beta1"]), b2=float(bh["beta2"]))

    def _optimize_op(self, operator, opt, x_den, t_hat, op_params, opt_state, H, rng):
        """Inner loop: op_updates_per_step Adam updates of the subband filter
        (EulerHeunSamplerDPS.py:71-113).  Returns the params, the optimizer
        state, the last-computed H, and the advanced rng.

        Constants are hoisted out of the 10-iteration loop: the observation
        spectrum (already transformed by the loss), and the STFT of x_den —
        x_den is stop-gradient'd so re-STFTing it every update is pure waste.
        """
        y = self._y_prep_params if self._y_prep_params is not None else (
            self.y_stft if self.y_stft is not None else self.y)
        y_prepared = self._y_prep_params is not None
        n_updates = int(self.ps["blind_hp"]["op_updates_per_step"])
        t_op = jnp.clip(t_hat, self.reg_sigma_min, self.reg_sigma_max) \
            if self.reg_loss is not None else None
        X_den = operator.apply_stft(x_den)
        # the frame-axis FFT of X_den is also constant across the inner
        # updates — hoist it so each update only FFTs the H side
        Xf_den = operator.frame_fft(X_den)
        x_len = x_den.shape[-1]

        def loss_fn(p, k_reg):
            H = operator.compute_H(p)
            y_hat = operator.degradation(None, H=H, mode="waveform",
                                         X=X_den, Xf=Xf_den, length=x_len)
            if self.rec_loss_params is None:
                loss = 0.0
            elif y_prepared:
                loss = self.rec_loss_params(y, y_hat, x_prepared=True)
            else:
                loss = self.rec_loss_params(y, y_hat)
            if self.reg_loss is not None:
                rir_time = operator.get_time_RIR(H=H)
                rir_noisy = rir_time + t_op * jax.random.normal(k_reg, rir_time.shape)
                loss = loss + self.reg_loss(rir_time, jax.lax.stop_gradient(rir_noisy))
            return loss, H

        def inner(carry, _):
            p, s, _H, k = carry
            k, k_reg = jax.random.split(k)
            grads, H = jax.grad(loss_fn, has_aux=True)(p, k_reg)
            updates, s = opt.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            p = operator.project(p)
            return (p, s, H, k), None

        # unroll=2: halves the inner-loop iteration overhead and lets XLA
        # fuse across update pairs without the ~10x program-size (and cold
        # compile time) cost of a full unroll
        (op_params, opt_state, H, rng), _ = jax.lax.scan(
            inner, (op_params, opt_state, H, rng), None, length=n_updates,
            unroll=2 if n_updates % 2 == 0 else 1)
        return op_params, opt_state, jax.lax.stop_gradient(H), rng

    def _likelihood_score(self, x_den, vjp_fn, degrade):
        """zeta-normalized DPS guidance (EulerHeunSamplerDPS.py:61-69).

        ``vjp_fn`` None means identity-Jacobian mode: the operator-side
        gradient wrt x_den is used as the guidance direction without
        pulling it back through the denoiser."""
        if self._y_prep is not None:
            y_ref, prepared = self._y_prep, True
        else:
            y_ref = self.y_stft if self.y_stft is not None else self.y
            prepared = False

        def rec_of_xden(xd):
            if prepared:
                return self.rec_loss(y_ref, degrade(xd), x_prepared=True)
            return self.rec_loss(y_ref, degrade(xd))
        rec, g_xden = jax.value_and_grad(rec_of_xden)(x_den)
        rec_grads = g_xden if vjp_fn is None else vjp_fn(g_xden)[0]
        normguide = jnp.linalg.norm(rec_grads) / (self.audio_len ** 0.5)
        return self.zeta / (normguide + 1e-8) * rec_grads, rec

    def _guided_update(self, x_hat, t_hat, operator, opt, blind,
                       op_params, opt_state, H, rng, net_params=()):
        """Denoise + (blind) operator optimization + guidance at one sigma.
        Returns (x_den_for_score, ode_integrand, op_state...)."""
        if self.guidance_jacobian == "identity":
            x_den = self._denoise(x_hat, t_hat, net_params)
            vjp_fn = None  # _likelihood_score applies g_xden directly
        else:
            x_den, vjp_fn = jax.vjp(
                lambda xh: self._denoise(xh, t_hat, net_params), x_hat)

        if blind:
            op_params, opt_state, H, rng = self._optimize_op(
                operator, opt, jax.lax.stop_gradient(x_den), t_hat,
                op_params, opt_state, H, rng)
            degrade = lambda xd: operator.degradation(xd, H=H, mode="waveform")
        elif H is not None:
            if hasattr(operator, "subband_filtering"):
                degrade = lambda xd: operator.degradation(xd, H=H, mode="waveform")
            else:  # RIROperator: H carries the (padded) time-domain RIR
                degrade = lambda xd: operator.degradation(xd, filt=H)
        else:
            degrade = lambda xd: operator.degradation(xd)

        lh_score, _rec = self._likelihood_score(x_den, vjp_fn, degrade)
        x_den = jax.lax.stop_gradient(x_den)

        csm = self.ps.get("constraint_speech_magnitude", None)
        if csm is not None and csm.get("use", False):
            x_den = float(csm["speech_scaling"]) / _std(x_den) * x_den

        d = (x_hat - x_den) / t_hat + lh_score  # -t*score + lh
        return x_den, d, op_params, opt_state, H, rng

    def _scan_step(self, operator, opt, blind, carry, inp, net_params=()):
        """One guided reverse-diffusion step (EulerHeunSamplerDPS.py:115-157)."""
        x, rng, op_params, opt_state, H = carry
        t_i, t_ip1, gamma_i = inp
        rng, k_eps = jax.random.split(rng)

        t_hat = t_i + gamma_i * t_i
        eps = jax.random.normal(k_eps, x.shape, x.dtype)
        x_hat = x + jnp.sqrt(jnp.maximum(t_hat ** 2 - t_i ** 2, 0.0)) * eps

        x_den, d, op_params, opt_state, H, rng = self._guided_update(
            x_hat, t_hat, operator, opt, blind, op_params, opt_state, H, rng,
            net_params)
        dt = t_ip1 - t_hat
        x_euler = x_hat + dt * d

        if self.order == 2:
            def second_order(args):
                op_params, opt_state, H, rng = args
                x_prime = x_euler
                x_den2, d2, op_params, opt_state, H, rng = self._guided_update(
                    x_prime, t_ip1, operator, opt, blind,
                    op_params, opt_state, H, rng, net_params)
                x_next = x_hat + dt * 0.5 * (d + d2)
                return x_next, x_den2, op_params, opt_state, H, rng

            def first_order(args):
                op_params, opt_state, H, rng = args
                return x_euler, x_den, op_params, opt_state, H, rng

            x_next, x_den, op_params, opt_state, H, rng = jax.lax.cond(
                t_ip1 != 0.0, second_order, first_order,
                (op_params, opt_state, H, rng))
        else:
            x_next = x_euler

        return (x_next, rng, op_params, opt_state, H), x_den

    # ------------------------------------------------------------------
    def _run(self, operator, blind, shape, net_params, y, rng, op_params, H):
        """The jitted sampling program.  ``op_params``/``H`` are explicit
        inputs (NOT closure-baked) so per-utterance operator state never
        retriggers compilation."""
        self.y = y
        self.y_stft = (operator.apply_stft(y)
                       if hasattr(operator, "apply_stft") else None)
        # hoist the loss-side transform of the constant observation out of
        # the scan: ~50 guidance evals + 500 inner-loop evals reuse it
        y_ref = self.y_stft if self.y_stft is not None else y
        self._y_prep = (self.rec_loss.prepare(y_ref)
                        if hasattr(self.rec_loss, "prepare") else None)
        self._y_prep_params = (
            self.rec_loss_params.prepare(y_ref)
            if self.rec_loss_params is not None
            and hasattr(self.rec_loss_params, "prepare") else None)
        t = self.create_schedule()
        gamma = self.get_gamma(t)
        rng, k_init = jax.random.split(rng)
        x = self.initialize_x(y, shape, k_init, t[0])

        if blind:
            opt = self._make_opt()
            opt_state = opt.init(op_params)
        else:
            opt = None
            opt_state = ()

        # x_den rides the carry: only the final step's denoised estimate is
        # consumed (EulerHeunSamplerDPS.py:178), so stacking all T of them
        # (a (T, ...) buffer + one dynamic_update_slice per step) is waste
        def step(c, i):
            carry, _ = c
            carry, x_den = self._scan_step(operator, opt, blind, carry, i,
                                           net_params)
            return (carry, x_den), None

        inputs = (t[:-1], t[1:], gamma[:-1])
        # NOTE outer unroll=2 was TPU-benched r5 and REJECTED: parity
        # unchanged (4.022), fast path WORSE (7.373 vs 7.48) + ~40% more
        # compile — the 1.1 ms/step `while` self-time is not recoverable
        # by unrolling on this backend
        ((x, _, op_params, _, H), x_den_final), _ = jax.lax.scan(
            step, ((x, rng, op_params, opt_state, H), jnp.zeros_like(x)),
            inputs)
        return x, x_den_final, op_params, H

    def predict_conditional(self, y, operator, shape=None, blind=False,
                            rng=None, **_kwargs):
        """Run guided sampling; returns the final denoised estimate x_den
        (EulerHeunSamplerDPS.py:178 — NOT x)."""
        self._build_losses(operator, blind)
        self.operator = operator
        if shape is None:
            shape = y.shape
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        if blind:
            op_params = {k: jnp.asarray(v) for k, v in operator.params.items()}
            H = (operator.H if operator.H is not None
                 else operator.compute_H(op_params))
            op_key = ("blind", operator.n_fft, operator.Nf)
        else:
            op_params = {}
            if hasattr(operator, "subband_filtering"):
                H = operator.H
                op_key = ("subband", operator.n_fft, operator.Nf)
            else:
                H = operator.params  # the time-domain RIR
                op_key = ("rir", None if H is None else H.shape[-1])
        key = ("dps", blind, tuple(shape), op_key)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                partial(self._run, operator, blind, tuple(shape)))
        x, x_den, op_params, H = self._jit_cache[key](
            self.net_params(), y, rng, op_params, H)
        # surface final operator state for the tester (estimated RIR output)
        if blind:
            operator.params = {k: v for k, v in op_params.items()}
            operator.H = H
        return x_den

    def predict_conditional_batched(self, ys, operator, blind=False, rng=None,
                                    op_params_batch=None, H_batch=None):
        """Batched guided sampling over B utterances at once (BASELINE
        config 5: batched full-test-set dereverb).

        ``ys``: (B, 1, n) observations (same bucket length).  In blind mode
        each utterance carries its own operator parameter pytree / initial H
        (leading batch axis); the whole batch runs as one vmapped program —
        B utterances cost ~one utterance of wall time until the chip
        saturates.  Returns (B, 1, n) denoised estimates.
        """
        self._build_losses(operator, blind)
        self.operator = operator
        B = ys.shape[0]
        shape = tuple(ys.shape[1:])
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rngs = jax.random.split(rng, B)

        if blind:
            assert op_params_batch is not None and H_batch is not None
        else:
            op_params_batch = {}
            if hasattr(operator, "subband_filtering"):
                assert H_batch is not None
            elif H_batch is None:  # one shared RIR for the whole batch
                H_batch = jnp.broadcast_to(operator.params,
                                           (B,) + operator.params.shape)

        key = ("dps_batched", blind, B, shape,
               ("sub", operator.n_fft, operator.Nf)
               if hasattr(operator, "subband_filtering")
               else ("rir", H_batch.shape[-1]))
        if key not in self._jit_cache:
            run = partial(self._run, operator, blind, shape)
            self._jit_cache[key] = jax.jit(
                jax.vmap(run, in_axes=(None, 0, 0, 0, 0)))
        x, x_den, op_params, H = self._jit_cache[key](
            self.net_params(), ys, rngs, op_params_batch, H_batch)
        if blind:
            operator.params = op_params  # batched final params
            operator.H = H
        return x_den

    def predict_unconditional(self, *args, **kwargs):
        raise ValueError("DPS not made for unconditional sampling")
