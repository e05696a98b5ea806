"""Minimal lax.scan probes for the axon TPU backend."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp


def step(name, fn):
    t0 = time.time()
    try:
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        print(f"{name}: OK ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:120]}", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "basic"

if which == "basic":
    def f1():
        def body(c, _):
            return c * 1.01, None
        c, _ = jax.lax.scan(body, jnp.ones((1, 65536)), None, length=4)
        return c
    step("scan_trivial", lambda: jax.jit(f1)())

    def f2():
        def body(c, _):
            x, H = c
            return (x * 1.01, H * (1 + 0.01j)), None
        c, _ = jax.lax.scan(body, (jnp.ones((1, 65536)),
                                   jnp.ones((513, 100), jnp.complex64)), None, length=4)
        return c[0].real
    step("scan_complex_carry", lambda: jax.jit(f2)())

    def f3():
        def body(c, _):
            return c * 1.01, c
        c, ys = jax.lax.scan(body, jnp.ones((1, 65536)), None, length=4)
        return ys
    step("scan_stacked_out", lambda: jax.jit(f3)())

    def f4():
        def inner(c, _):
            return c + 1.0, None
        def body(c, _):
            c2, _ = jax.lax.scan(inner, c, None, length=3)
            return c2 * 0.99, None
        c, _ = jax.lax.scan(body, jnp.ones((513, 100)), None, length=4)
        return c
    step("nested_scan", lambda: jax.jit(f4)())

    def f5():
        def body(c, _):
            k1, k2 = jax.random.split(c)
            return k2, None
        c, _ = jax.lax.scan(body, jax.random.PRNGKey(0), None, length=4)
        return jax.random.normal(c, (4,))
    step("scan_rng_carry", lambda: jax.jit(f5)())

if which == "unet":
    from buddy_tpu.config import compose, instantiate
    from buddy_tpu.models import NetworkBundle
    args = compose("conf_VCTK.yaml")
    module = instantiate(args["network"])
    network = NetworkBundle(module)
    network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 65536)), jnp.zeros((1,)))
    print("init done", flush=True)

    def fwd_scan(params, x):
        def body(c, _):
            out = module.apply(params, c[:, None, :], jnp.asarray([0.0]))[:, 0, :]
            return out, None
        c, _ = jax.lax.scan(body, x, None, length=2)
        return c
    x = jnp.ones((1, 65536)) * 0.01
    step("scan_unet_fwd", lambda: jax.jit(fwd_scan)(network.params, x))

    def vjp_scan(params, x):
        def body(c, _):
            out, vjp = jax.vjp(
                lambda xx: module.apply(params, xx[:, None, :],
                                        jnp.asarray([0.0]))[:, 0, :], c)
            g = vjp(out)[0]
            return c - 0.1 * g, None
        c, _ = jax.lax.scan(body, x, None, length=2)
        return c
    step("scan_unet_vjp", lambda: jax.jit(vjp_scan)(network.params, x))

if which == "nested_op":
    import optax
    from buddy_tpu.config import compose as _compose
    from buddy_tpu.operators.subband import BlindSubbandFiltering
    from buddy_tpu.losses import get_loss
    args = _compose("conf_VCTK.yaml", ["tester=blind_dereverberation_BUDDy"])
    op_hp = args["tester"]["informed_dereverberation"]["op_hp"]
    op = BlindSubbandFiltering(op_hp, sample_rate=16000)
    op.reset(jax.random.PRNGKey(0))
    rec = get_loss(args["tester"]["posterior_sampling"]["rec_loss_params"], operator=op)
    x = jnp.ones((1, 65536)) * 0.01
    y = jnp.ones((1, 65536)) * 0.01
    opt = optax.adam(0.1, b1=0.9, b2=0.99)
    p0 = {k: jnp.asarray(v) for k, v in op.params.items()}

    def nested(p, H):
        s0 = opt.init(p)
        def outer(carry, _):
            p, s, H = carry
            def inner(c, _):
                p, s, H = c
                def loss_fn(pp):
                    Hn = op.compute_H(pp)
                    yh = op.degradation(x, H=Hn, mode="waveform")
                    return rec(y, yh), Hn
                g, Hn = jax.grad(loss_fn, has_aux=True)(p)
                u, s = opt.update(g, s, p)
                p = optax.apply_updates(p, u)
                p = op.project(p)
                return (p, s, Hn), None
            (p, s, H), _ = jax.lax.scan(inner, (p, s, H), None, length=2)
            return (p, s, H), None
        (p, s, H), _ = jax.lax.scan(outer, (p, s0, H), None, length=2)
        return p["decay"]
    step("nested_op_scan", lambda: jax.jit(nested)(p0, op.H))

if which == "scan_guidance":
    from buddy_tpu.config import compose as _compose, instantiate as _inst
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.diffusion.edm import EDM
    from buddy_tpu.sampling.dps import EulerHeunSamplerDPS
    from buddy_tpu.operators.subband import BlindSubbandFiltering
    args = _compose("conf_VCTK.yaml", ["tester=blind_dereverberation_BUDDy"])
    args["tester"]["posterior_sampling"]["warm_initialization"]["mode"] = "none"
    op_hp = args["tester"]["informed_dereverberation"]["op_hp"]
    op = BlindSubbandFiltering(op_hp, sample_rate=16000)
    op.reset(jax.random.PRNGKey(0))
    module = _inst(args["network"])
    edm = EDM(sde_hp=dict(args["tester"]["sampling_params"]["sde_hp"]))
    network = NetworkBundle(module)
    network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 65536)), jnp.zeros((1,)))
    print("init done", flush=True)
    sampler = EulerHeunSamplerDPS(network, edm, args)
    sampler._build_losses(op, blind=False)  # guidance only, no inner loop
    x = jnp.ones((1, 65536)) * 0.01
    y = jax.jit(lambda xx, H: op.degradation(xx, H=H, mode="waveform"))(x, op.H)
    sampler.T = 2
    def scan_informed(net_params, y, rng):
        return sampler._run(op, False, (1, 65536), net_params, y, rng, {}, op.H)
    step("scan_guidance_informed", lambda: jax.jit(scan_informed)(
        network.params, y, jax.random.PRNGKey(3)))

if which in ("unrolled", "scan_same"):
    from buddy_tpu.config import compose as _compose, instantiate as _inst
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.diffusion.edm import EDM
    from buddy_tpu.sampling.dps import EulerHeunSamplerDPS
    from buddy_tpu.operators.subband import BlindSubbandFiltering
    args = _compose("conf_VCTK.yaml", ["tester=blind_dereverberation_BUDDy"])
    args["tester"]["posterior_sampling"]["warm_initialization"]["mode"] = "none"
    op_hp = args["tester"]["informed_dereverberation"]["op_hp"]
    op = BlindSubbandFiltering(op_hp, sample_rate=16000)
    op.reset(jax.random.PRNGKey(0))
    module = _inst(args["network"])
    edm = EDM(sde_hp=dict(args["tester"]["sampling_params"]["sde_hp"]))
    network = NetworkBundle(module)
    network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 65536)), jnp.zeros((1,)))
    print("init done", flush=True)
    sampler = EulerHeunSamplerDPS(network, edm, args)
    sampler._build_losses(op, blind=False)
    x = jnp.ones((1, 65536)) * 0.01
    y = jax.jit(lambda xx, H: op.degradation(xx, H=H, mode="waveform"))(x, op.H)
    sampler.y = y
    t = sampler.create_schedule()

    def stepfn(carry, inp, net_params):
        return sampler._scan_step(op, None, False, carry, inp, net_params)

    if which == "unrolled":
        def unrolled2(net_params, y, rng):
            sampler.y = y
            carry = (x, rng, {}, (), op.H)
            carry, d1 = stepfn(carry, (t[0], t[1], jnp.float32(0.2)), net_params)
            carry, d2 = stepfn(carry, (t[1], t[2], jnp.float32(0.2)), net_params)
            return carry[0], d2
        step("unrolled2_guidance", lambda: jax.jit(unrolled2)(
            network.params, y, jax.random.PRNGKey(3)))

    if which == "scan_same":
        def scanned2(net_params, y, rng):
            sampler.y = y
            carry = (x, rng, {}, (), op.H)
            inputs = (t[:2], t[1:3], jnp.full((2,), 0.2))
            carry, ds = jax.lax.scan(
                lambda c, i: stepfn(c, i, net_params), carry, inputs)
            return carry[0], ds[-1]
        step("scan2_guidance", lambda: jax.jit(scanned2)(
            network.params, y, jax.random.PRNGKey(3)))

if which == "one_informed":
    # identical setup to 'unrolled' but a single step
    from buddy_tpu.config import compose as _compose, instantiate as _inst
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.diffusion.edm import EDM
    from buddy_tpu.sampling.dps import EulerHeunSamplerDPS
    from buddy_tpu.operators.subband import BlindSubbandFiltering
    args = _compose("conf_VCTK.yaml", ["tester=blind_dereverberation_BUDDy"])
    op_hp = args["tester"]["informed_dereverberation"]["op_hp"]
    op = BlindSubbandFiltering(op_hp, sample_rate=16000)
    op.reset(jax.random.PRNGKey(0))
    module = _inst(args["network"])
    edm = EDM(sde_hp=dict(args["tester"]["sampling_params"]["sde_hp"]))
    network = NetworkBundle(module)
    network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 65536)), jnp.zeros((1,)))
    print("init done", flush=True)
    sampler = EulerHeunSamplerDPS(network, edm, args)
    sampler._build_losses(op, blind=False)
    x = jnp.ones((1, 65536)) * 0.01
    y = jax.jit(lambda xx, H: op.degradation(xx, H=H, mode="waveform"))(x, op.H)
    sampler.y = y
    t = sampler.create_schedule()
    def one(net_params, y, rng):
        sampler.y = y
        carry = (x, rng, {}, (), op.H)
        carry, d = sampler._scan_step(op, None, False, carry,
                                      (t[0], t[1], jnp.float32(0.2)), net_params)
        return carry[0], d
    step("one_informed_step", lambda: jax.jit(one)(network.params, y,
                                                   jax.random.PRNGKey(3)))

if which == "one_informed_staged":
    from buddy_tpu.config import compose as _compose, instantiate as _inst
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.diffusion.edm import EDM
    from buddy_tpu.sampling.dps import EulerHeunSamplerDPS
    from buddy_tpu.operators.subband import BlindSubbandFiltering
    args = _compose("conf_VCTK.yaml", ["tester=blind_dereverberation_BUDDy"])
    op_hp = args["tester"]["informed_dereverberation"]["op_hp"]
    op = BlindSubbandFiltering(op_hp, sample_rate=16000)
    op.reset(jax.random.PRNGKey(0))
    module = _inst(args["network"])
    edm = EDM(sde_hp=dict(args["tester"]["sampling_params"]["sde_hp"]))
    network = NetworkBundle(module)
    network.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 65536)), jnp.zeros((1,)))
    print("init done", flush=True)
    sampler = EulerHeunSamplerDPS(network, edm, args)
    sampler._build_losses(op, blind=False)
    x = jnp.ones((1, 65536)) * 0.01
    y = jax.jit(lambda xx, H: op.degradation(xx, H=H, mode="waveform"))(x, op.H)
    sampler.y = y
    t = sampler.create_schedule()
    def one(net_params, y, rng):
        sampler.y = y
        carry = (x, rng, {}, (), op.H)
        carry, d = sampler._scan_step(op, None, False, carry,
                                      (t[0], t[1], jnp.float32(0.2)), net_params)
        return carry[0], d
    import time as _t
    t0=_t.time()
    lowered = jax.jit(one).lower(network.params, y, jax.random.PRNGKey(3))
    print(f"lowered ok ({_t.time()-t0:.0f}s)", flush=True)
    t0=_t.time()
    compiled = lowered.compile()
    print(f"compiled ok ({_t.time()-t0:.0f}s)", flush=True)
    t0=_t.time()
    out = compiled(network.params, y, jax.random.PRNGKey(3))
    print("executed, reading back...", flush=True)
    print("readback:", np.asarray(out[0]).shape, f"({_t.time()-t0:.0f}s)", flush=True)
