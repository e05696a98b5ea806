"""Golden parity for the BLIND DPS step — the flagship BUDDy workload.

One full guided diffusion step with 3 inner Adam updates of the subband
operator, run deterministically (Schurn=0, RIR-noise regularization off) on
both the torch reference and our scan step, starting from identical operator
parameters.  Verifies: filter design + cons inside the inner loop, Adam
updates + projection, the H handed to guidance, the zeta-normalized
likelihood score through the denoiser, and the speech-magnitude constraint.

A second test checks the RIR-noise regularization gradient with a shared
fixed noise realization.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from buddy_tpu.config import ConfigDict
from buddy_tpu.diffusion.edm import EDM
from buddy_tpu.sampling.dps import EulerHeunSamplerDPS

from ref_stubs import ref_path
from test_operators import OP_HP
from test_samplers import make_args, _TorchMockNet, _jax_mock_net


def make_blind_args(op_updates=3, reg_use=False):
    args = make_args(T=5, order=1, Schurn=0.0, zeta=0.5, warm="none",
                     constraint_speech=True)
    args.tester.posterior_sampling.rec_loss_params = ConfigDict(
        {"name": "l2_comp_stft_summean", "weight": 512, "compression_factor": 0.667})
    # the reference gates the reg loss solely on loss.name != "none"
    # (the ``use`` key is decorative upstream) — mirror that here
    args.tester.posterior_sampling.RIR_noise_regularization = ConfigDict({
        "use": reg_use, "crop_sigma_max": 0.01, "crop_sigma_min": 5e-4,
        "loss": {"name": "l2_comp_stft_summean" if reg_use else "none",
                 "weight": 2560, "compression_factor": 0.667}})
    args.tester.posterior_sampling.blind_hp = ConfigDict({
        "optimizer": "adam", "lr_op": 0.1, "beta1": 0.9, "beta2": 0.99,
        "noise": 0.1, "lr_op_phase": 1, "weight_decay": 0,
        "op_updates_per_step": op_updates, "grad_clip": 1})
    return args


@pytest.fixture(scope="module")
def blind_setup(rng=np.random.default_rng(7)):
    ref_path()
    from testing.EulerHeunSamplerDPS import EulerHeunSamplerDPS as RefDPS
    from testing.operators.subband_filtering import BlindSubbandFiltering as RefBlind
    from diff_params.edm import EDM as RefEDM
    from utils.losses import get_loss as ref_get_loss
    from buddy_tpu.operators.subband import BlindSubbandFiltering

    args = make_blind_args()

    torch.manual_seed(3)
    ref_op = RefBlind(OP_HP, sample_rate=16000)
    our_op = BlindSubbandFiltering(OP_HP, sample_rate=16000)

    # sync operator parameters
    decay = rng.uniform(0.1, 0.5, (1, 25)).astype(np.float32)
    weights = rng.uniform(1.5, 2.5, (1, 25)).astype(np.float32)
    phases = rng.uniform(-np.pi, np.pi, (513, 100)).astype(np.float32)
    with torch.no_grad():
        ref_op.params[0].data = torch.from_numpy(decay.copy())
        ref_op.params[1].data = torch.from_numpy(weights.copy())
        ref_op.params_phases[0].data = torch.from_numpy(phases.copy())
        ref_op.update_H()
    our_params = {"decay": jnp.asarray(decay), "weights": jnp.asarray(weights),
                  "phases": jnp.asarray(phases)}
    our_op.params = our_params
    our_op.H = our_op.compute_H(our_params)
    np.testing.assert_allclose(np.asarray(our_op.H), ref_op.H.detach().numpy(), atol=5e-3)

    x_clean = rng.standard_normal((1, 4096)).astype(np.float32) * 0.05
    with torch.no_grad():
        y_ref = ref_op.degradation(torch.from_numpy(x_clean.copy())).numpy()

    return dict(args=args, ref_op=ref_op, our_op=our_op,
                RefDPS=RefDPS, RefEDM=RefEDM, ref_get_loss=ref_get_loss,
                y=y_ref, x0=rng.standard_normal((1, 4096)).astype(np.float32),
                params=(decay, weights, phases))


def test_blind_step_parity(blind_setup):
    args = blind_setup["args"]
    ref_op, our_op = blind_setup["ref_op"], blind_setup["our_op"]
    y, x0 = blind_setup["y"], blind_setup["x0"]

    # ---- torch reference step
    RefDPS, RefEDM = blind_setup["RefDPS"], blind_setup["RefEDM"]
    ref_get_loss = blind_setup["ref_get_loss"]
    ref_edm = RefEDM("ve_karras", args.tester.sampling_params.sde_hp)
    ref = RefDPS(_TorchMockNet(), ref_edm, args)
    ref.operator = ref_op
    ref.y = torch.from_numpy(y.copy())
    ps = args.tester.posterior_sampling
    ref.rec_loss = ref_get_loss(ps.rec_loss, operator=ref_op)
    ref.rec_loss_params = ref_get_loss(ps.rec_loss_params, operator=ref_op)
    ref.RIR_noise_regularization_loss = None
    ref.optimizer_operator = torch.optim.Adam(
        ref_op.params + ref_op.params_phases, lr=ps.blind_hp.lr_op,
        weight_decay=ps.blind_hp.weight_decay,
        betas=(ps.blind_hp.beta1, ps.blind_hp.beta2))

    t_sched = ref.create_schedule()
    x_ref, xden_ref = ref.step(torch.from_numpy(x0.copy()), t_sched[0],
                               t_sched[1], torch.tensor(0.0), blind=True)
    x_ref = x_ref.detach().numpy()
    xden_ref = xden_ref.detach().numpy()
    ref_decay = ref_op.params[0].detach().numpy()
    ref_weights = ref_op.params[1].detach().numpy()
    ref_phases = ref_op.params_phases[0].detach().numpy()
    ref_H = ref_op.H.detach().numpy()

    # ---- our scan step
    edm = EDM(sde_hp=dict(args.tester.sampling_params.sde_hp))
    ours = EulerHeunSamplerDPS(model=_jax_mock_net, diff_params=edm, args=args)
    ours._build_losses(our_op, blind=True)
    assert ours.reg_loss is None
    ours.y = jnp.asarray(y)
    opt = ours._make_opt()
    op_params = {k: jnp.asarray(v) for k, v in our_op.params.items()}
    opt_state = opt.init(op_params)
    tj = ours.create_schedule()
    carry = (jnp.asarray(x0), jax.random.PRNGKey(0), op_params, opt_state, our_op.H)
    carry, xden_j = ours._scan_step(our_op, opt, True, carry,
                                    (tj[0], tj[1], jnp.float32(0.0)))
    x_j = np.asarray(carry[0])
    new_params = carry[2]
    H_j = np.asarray(carry[4])

    np.testing.assert_allclose(np.asarray(new_params["decay"]), ref_decay,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_params["weights"]), ref_weights,
                               rtol=1e-3, atol=1e-3)
    # phases move by ~lr each update; compare within wrap-free tolerance
    np.testing.assert_allclose(np.asarray(new_params["phases"]), ref_phases,
                               rtol=5e-3, atol=2e-2)
    np.testing.assert_allclose(H_j, ref_H, atol=2e-2)
    np.testing.assert_allclose(np.asarray(xden_j), xden_ref, atol=1e-3)
    np.testing.assert_allclose(x_j, x_ref, atol=5e-3)


def test_full_program_blind_waveform_parity(blind_setup):
    """Full-program BLIND parity (VERDICT r2 item 4): the reference's own
    predict_conditional (which builds losses + the operator Adam and runs the
    complete T=5 predict loop with 3 inner updates per step) vs our jitted
    scan program — final waveform AND final operator parameters.  The warm
    init (mode "none") noise draw is shared by patching initialize_x; the
    reg loss resolves to None on both sides (name "none"), so the program is
    fully deterministic."""
    args = blind_setup["args"]
    ref_op, our_op = blind_setup["ref_op"], blind_setup["our_op"]
    y = blind_setup["y"]
    decay, weights, phases = blind_setup["params"]

    # module-scoped fixture: earlier tests mutate ref_op in place — re-sync
    with torch.no_grad():
        ref_op.params[0].data = torch.from_numpy(decay.copy())
        ref_op.params[1].data = torch.from_numpy(weights.copy())
        ref_op.params_phases[0].data = torch.from_numpy(phases.copy())
        ref_op.update_H()

    RefDPS, RefEDM = blind_setup["RefDPS"], blind_setup["RefEDM"]
    ref_edm = RefEDM("ve_karras", args.tester.sampling_params.sde_hp)
    ref = RefDPS(_TorchMockNet(), ref_edm, args)
    t0 = float(ref.create_schedule()[0])
    rng = np.random.default_rng(23)
    eps = rng.standard_normal((1, 4096)).astype(np.float32)
    x_init = (t0 * eps).astype(np.float32)
    ref.initialize_x = lambda shape, device, schedule: torch.from_numpy(x_init.copy())
    ref_out = ref.predict_conditional(torch.from_numpy(y.copy()), ref_op,
                                      shape=(1, 4096), blind=True).detach().numpy()
    assert ref.RIR_noise_regularization_loss is None  # name "none" upstream too
    ref_decay = ref_op.params[0].detach().numpy()
    ref_weights = ref_op.params[1].detach().numpy()

    # ---- jax side
    edm = EDM(sde_hp=dict(args.tester.sampling_params.sde_hp))
    ours = EulerHeunSamplerDPS(model=_jax_mock_net, diff_params=edm, args=args)
    our_op.params = {"decay": jnp.asarray(decay), "weights": jnp.asarray(weights),
                     "phases": jnp.asarray(phases)}
    our_op.H = our_op.compute_H(our_op.params)
    ours.initialize_x = lambda y_, shape, rng_, t0_: jnp.asarray(x_init)
    ours_out = np.asarray(ours.predict_conditional(
        jnp.asarray(y), our_op, shape=(1, 4096), blind=True,
        rng=jax.random.PRNGKey(0)))

    assert ours_out.shape == ref_out.shape
    assert np.isfinite(ours_out).all()
    scale = max(np.abs(ref_out).max(), 1e-3)
    np.testing.assert_allclose(ours_out, ref_out, atol=1e-2 * scale)
    # final operator parameters track the reference over 5x3 Adam updates
    np.testing.assert_allclose(np.asarray(our_op.params["decay"]), ref_decay,
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(our_op.params["weights"]), ref_weights,
                               rtol=5e-3, atol=5e-3)


def test_rir_noise_regularization_grad_parity(blind_setup):
    """Reg-loss gradients with a shared fixed noise realization
    (EulerHeunSamplerDPS.py:94-101)."""
    ref_op, our_op = blind_setup["ref_op"], blind_setup["our_op"]
    decay, weights, phases = blind_setup["params"]
    ref_get_loss = blind_setup["ref_get_loss"]
    from buddy_tpu.losses import get_loss

    reg_cfg = ConfigDict({"name": "l2_comp_stft_summean", "weight": 2560,
                          "compression_factor": 0.667})
    t_op = 0.01
    rng = np.random.default_rng(11)
    noise = rng.standard_normal(ref_op.length_rir + 1024).astype(np.float32)

    # torch: grads of reg loss wrt decay/weights/phases
    with torch.no_grad():
        ref_op.params[0].data = torch.from_numpy(decay.copy())
        ref_op.params[1].data = torch.from_numpy(weights.copy())
        ref_op.params_phases[0].data = torch.from_numpy(phases.copy())
    for p in ref_op.params + ref_op.params_phases:
        p.requires_grad_(True)
        p.grad = None
    ref_op.update_H()
    rir_time = ref_op.get_time_RIR()
    rir_noisy = rir_time + t_op * torch.from_numpy(noise.copy())
    ref_loss_fn = ref_get_loss(reg_cfg, operator=ref_op)
    loss_t = ref_loss_fn(rir_time, rir_noisy.detach())
    loss_t.backward()
    ref_grads = [p.grad.detach().numpy() for p in ref_op.params + ref_op.params_phases]

    # jax
    our_loss_fn = get_loss(reg_cfg, operator=our_op)

    def loss_fn(p):
        H = our_op.compute_H(p)
        rt = our_op.get_time_RIR(H=H)
        rn = rt + t_op * jnp.asarray(noise)
        return our_loss_fn(rt, jax.lax.stop_gradient(rn))

    params = {"decay": jnp.asarray(decay), "weights": jnp.asarray(weights),
              "phases": jnp.asarray(phases)}
    loss_j, grads = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(grads["decay"]), ref_grads[0], rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(grads["weights"]), ref_grads[1], rtol=2e-2, atol=1e-3)
    # phases grads go through istft->minphase->stft; fp32 accumulation leaves
    # ~0.03% of elements off by up to ~2e-2 — tolerate that
    np.testing.assert_allclose(np.asarray(grads["phases"]), ref_grads[2], rtol=5e-2, atol=2e-2)
