"""Benchmark: blind dereverberation real-time factor + score-net step time.

Runs the flagship workload (BASELINE.json north-star): 50-step blind
dereverberation of 4 s VCTK utterances on one TPU chip — the full BUDDy
pipeline (per-step U-Net denoise + DPS guidance + 10 subband operator Adam
updates) compiled into a single lax.scan program, vmapped over a batch of
utterances (throughput mode: RTF = total audio seconds / wall).

The benchmarked configuration is the production serving path:
* batch of BENCH_B utterances per program (default 8),
* bfloat16 U-Net body (BENCH_DTYPE; STFT + GroupNorm stats stay f32) —
  validated against f32 end-to-end by tests/test_e2e.py,
* persistent compilation cache (.jax_cache) so repeat runs skip the
  ~50 s blind-program compile.

Prints ONE JSON line:
    {"metric": ..., "value": RTF, "unit": "x_realtime", "vs_baseline": ...}
vs_baseline is measured against the >10x-real-time north-star target
(the reference repo publishes no numbers of its own, BASELINE.md).

``value`` is always the parity-faithful program (full DPS guidance — the
reference's exact algorithm, testing/EulerHeunSamplerDPS.py:61-69).  The
same run also measures ``rtf_fast``: the identity-Jacobian guidance variant
(MPGD/PiGDM-style, skips the U-Net vjp) on the same network — the fast
serving profile documented in README.md; QUALITY.md carries the
trained-weights quality evidence for it.  BENCH_FAST=0 disables it.
"""

import json
import os
import sys
import time

import numpy as np


def _device_alive(timeout_s: float = 180.0) -> bool:
    """Probe the accelerator with a tiny op under a deadline.

    The TPU tunnel can wedge (observed: >7 h dead after a killed client);
    without this guard the benchmark would hang at the first device op and
    never emit its JSON line."""
    import threading

    ok = []

    def probe():
        try:
            import jax
            import jax.numpy as jnp
            jnp.ones((8, 8)).sum().block_until_ready()
            ok.append(True)
        except Exception:
            pass

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return bool(ok)


def main():
    if not _device_alive(float(os.environ.get("BENCH_PROBE_TIMEOUT", 180))):
        print(json.dumps({
            "metric": "Blind dereverb real-time factor (50-step EDM); "
                      "score-net ms/step",
            "value": 0.0, "unit": "x_realtime", "vs_baseline": 0.0,
            "error": "device unreachable (tunnel probe timed out)"}))
        return

    import jax
    import jax.numpy as jnp

    from buddy_tpu.utils.device import enable_compilation_cache
    enable_compilation_cache()

    t_setup = time.time()
    from buddy_tpu.config import compose, instantiate
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.diffusion.edm import EDM
    from buddy_tpu.operators.reverb import RIROperator
    from buddy_tpu.operators.subband import BlindSubbandFiltering
    from buddy_tpu.data.audio_io import read_wav

    T_STEPS = int(os.environ.get("BENCH_T", 50))
    B = int(os.environ.get("BENCH_B", 8))
    DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
    INT8 = os.environ.get("BENCH_INT8", "0") == "1"
    INT8_STATIC = INT8 and os.environ.get("BENCH_INT8_STATIC", "0") == "1"
    AUDIO_LEN = 65536  # 4.096 s @ 16 kHz
    SR = 16000

    args = compose("conf_VCTK.yaml", [
        "tester=blind_dereverberation_BUDDy",
        f"tester.sampling_params.T={T_STEPS}",
        f"network.compute_dtype={DTYPE}",
        f"network.quantize_int8={str(INT8).lower()}",
        f"network.quantize_accum={os.environ.get('BENCH_INT8_ACCUM', 'int32')}",
        "network.quantize_bwd="
        f"{str(os.environ.get('BENCH_INT8_BWD', '0') == '1').lower()}",
        # calibrated static activation scales: drops the per-conv dynamic
        # max|x| reduce (~9.6 ms/step at B=8) — needs the calibration pass
        # below before any timed apply
        f"network.quantize_static={str(INT8_STATIC).lower()}",
        # serving default: fold nearest-up2 into the up-convs — exact to
        # float rounding, identical param tree, measured 3.75x vs 3.37x RTF
        # (ops/resample.py:111; tests/test_kernels.py gate parity)
        "network.fuse_resample="
        f"{str(os.environ.get('BENCH_FUSE_UP', '1') == '1').lower()}",
        "tester.posterior_sampling.guidance_jacobian="
        f"{os.environ.get('BENCH_GUIDANCE', 'full')}",
    ])

    # flagship network (nf=128, ch_mult [1,2,2,2]) with random weights —
    # identical compute graph to the pretrained checkpoint
    module = instantiate(args["network"])
    edm = EDM(sde_hp=dict(args["diff_params"]["sde_hp"]))
    network = NetworkBundle(module)
    x0 = jnp.zeros((1, 1, AUDIO_LEN), jnp.float32)
    print("bench: init network...", file=sys.stderr, flush=True)
    network.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.float32))
    print(f"bench: network ready ({network.num_params/1e6:.1f}M params, "
          f"{time.time()-t_setup:.0f}s)", file=sys.stderr, flush=True)

    if INT8_STATIC:
        # observe |activation| maxima over the sigma schedule at serving
        # input scale (speech std 0.05), module-level inputs = (cin*x, cnoise)
        print("bench: calibrating int8 activation scales...",
              file=sys.stderr, flush=True)
        kx, kn = jax.random.split(jax.random.PRNGKey(7))
        xc = jax.random.normal(kx, (1, 1, AUDIO_LEN), jnp.float32) * 0.05
        hp = args["diff_params"]["sde_hp"]
        sigmas = np.geomspace(float(hp["sigma_max"]), float(hp["sigma_min"]), 8)
        xs, cns = [], []
        for s in sigmas:
            xn = xc + s * jax.random.normal(kn, xc.shape, jnp.float32)
            sig = jnp.full((1,), s, jnp.float32)
            xs.append(edm.cin(sig)[:, None, None] * xn)
            cns.append(edm.cnoise(sig))
        network.calibrate_quant(xs, cns)
        print(f"bench: scales calibrated ({time.time()-t_setup:.0f}s)",
              file=sys.stderr, flush=True)

    # --- score-net ms/step (single utterance, the serving dtype) -----------
    sampler_edm = instantiate(args["diff_params"])

    @jax.jit
    def denoise(params, x, sigma):
        net = lambda xx, cn: module.apply(params, xx, cn)
        return sampler_edm.denoiser(x[:, None, :], net, sigma)[:, 0, :]

    x = jax.random.normal(jax.random.PRNGKey(1), (1, AUDIO_LEN)) * 0.05
    sig = jnp.asarray([0.1], jnp.float32)
    print("bench: compiling denoiser...", file=sys.stderr, flush=True)
    denoise(network.params, x, sig).block_until_ready()  # compile
    print(f"bench: denoiser compiled ({time.time()-t_setup:.0f}s)",
          file=sys.stderr, flush=True)
    n_rep = 10
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = denoise(network.params, x, sig)
    out.block_until_ready()
    scorenet_ms = (time.perf_counter() - t0) / n_rep * 1e3

    # --- blind dereverb RTF, batched ---------------------------------------
    sampler = instantiate(args["tester"]["sampler"], network, edm, args)
    FAST = os.environ.get("BENCH_FAST", "1") == "1"
    fast_guidance = os.environ.get("BENCH_FAST_GUIDANCE", "identity")
    sampler_fast = None
    if FAST and fast_guidance != args["tester"]["posterior_sampling"].get(
            "guidance_jacobian", "full"):
        # same network/params — only the sampler's guidance mode differs
        import copy
        args_fast = copy.deepcopy(args)
        args_fast["tester"]["posterior_sampling"]["guidance_jacobian"] = \
            fast_guidance
        sampler_fast = instantiate(args_fast["tester"]["sampler"], network,
                                   edm, args_fast)

    # build a B-utterance batch from the two reference example speakers
    ys = []
    for b in range(B):
        spk, utt = [("p226", "p226_003"), ("p287", "p287_005")][b % 2]
        clean, _sr = read_wav(
            f"/root/reference/audio_examples/clean/{spk}/{utt}.wav")
        rir, _ = read_wav(f"/root/reference/audio_examples/rir/{spk}/{utt}.wav")
        rir = rir[int(np.argmax(np.abs(rir))):]
        rir = rir / np.abs(rir).max()
        rb = 4096
        rir = np.pad(rir, (0, ((len(rir) + rb - 1) // rb) * rb - len(rir)))
        seg = np.zeros(AUDIO_LEN, np.float32)
        n = min(len(clean), AUDIO_LEN)
        seg[:n] = clean[:n]
        seg = 0.05 * seg / seg.std(ddof=1)

        op_hp = args["tester"]["informed_dereverberation"]["op_hp"]
        ref_op = RIROperator(op_hp, time_kernel_size=len(rir), sample_rate=SR)
        ref_op.update_params(jnp.asarray(rir))
        ys.append(np.asarray(ref_op.degradation(jnp.asarray(seg)[None, :])))
    ys = jnp.asarray(np.stack(ys))  # (B, 1, AUDIO_LEN)

    print("bench: initializing blind operator...", file=sys.stderr, flush=True)
    op_hp = args["tester"]["informed_dereverberation"]["op_hp"]
    blind_op = BlindSubbandFiltering(op_hp, sample_rate=SR)
    op_params_b, H_b = blind_op.reset_batched(jax.random.PRNGKey(3), B)
    print(f"bench: operator ready ({time.time()-t_setup:.0f}s); compiling "
          f"blind program (B={B}, {DTYPE})...", file=sys.stderr, flush=True)

    setup_s = time.time() - t_setup  # everything before the blind compiles

    def time_program(smp, tag):
        """Compile + min-of-reps wall time for one sampler's blind program.
        Returns (wall, compile_s, error)."""
        def run_once(key):
            pred = smp.predict_conditional_batched(
                ys, blind_op, blind=True, rng=key,
                op_params_batch=op_params_b, H_batch=H_b)
            return np.asarray(pred)
        try:
            t0 = time.perf_counter()
            run_once(jax.random.PRNGKey(4))  # compile + first run
            comp = time.perf_counter() - t0
            print(f"bench: {tag} program compiled+ran ({comp:.0f}s); timing...",
                  file=sys.stderr, flush=True)
            n_rep = int(os.environ.get("BENCH_REPS", 3))
            times = []
            for i in range(n_rep):
                t0 = time.perf_counter()
                pred = run_once(jax.random.PRNGKey(5 + i))
                times.append(time.perf_counter() - t0)
                print(f"bench: {tag} rep {i}: {times[-1]:.2f}s",
                      file=sys.stderr, flush=True)
            assert np.isfinite(pred).all(), "non-finite output"
            return float(np.min(times)), comp, None
        except Exception as e:  # noqa: BLE001 — always emit the JSON line
            return None, None, str(e)[:200]

    wall, compile_s, error = time_program(sampler, "blind")
    wall_fast = compile_fast_s = None
    if sampler_fast is not None and error is None:
        wall_fast, compile_fast_s, _efast = time_program(sampler_fast,
                                                         f"fast/{fast_guidance}")

    audio_seconds = B * AUDIO_LEN / SR
    rtf = audio_seconds / wall if wall else 0.0
    rtf_fast = audio_seconds / wall_fast if wall_fast else None

    result = {
        "metric": "Blind dereverb real-time factor (50-step EDM); score-net ms/step",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10.0, 3),  # north-star: >10x real-time
        "score_net_ms_per_step": round(scorenet_ms, 3),
        "blind_50step_wall_s": round(wall, 3) if wall else None,
        "batch": B,
        "dtype": DTYPE + ("+int8" if INT8 else ""),
        "audio_seconds": round(audio_seconds, 3),
        "compile_s": round(compile_s, 1) if compile_s else None,
        # setup_s = time-to-ready (init + calibration + data prep), BEFORE
        # the blind compiles/reps; total_s = the whole bench run
        "setup_s": round(setup_s, 1),
        "total_s": round(time.time() - t_setup, 1),
        "device": str(jax.devices()[0]),
        "T": T_STEPS,
    }
    if rtf_fast is not None:
        result["rtf_fast"] = round(rtf_fast, 3)
        result["fast_config"] = {
            "guidance_jacobian": fast_guidance, "dtype": DTYPE,
            "fuse_resample": os.environ.get("BENCH_FUSE_UP", "1") == "1",
            "int8": INT8, "compile_s": round(compile_fast_s, 1)
            if compile_fast_s else None,
            "blind_50step_wall_s": round(wall_fast, 3)}
    if error:
        result["error"] = error
    print(json.dumps(result))


if __name__ == "__main__":
    main()
