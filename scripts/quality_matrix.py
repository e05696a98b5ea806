"""Variant quality matrix on TRAINED weights (VERDICT r3 task 4).

Runs the blind-DPS serving variants {f32/bf16, int8, int8-static} x
{full, identity guidance} on reverberant speech with a checkpoint trained
by train.py (speech-structured weights, not random init), scores each with
buddy_tpu.evaluation (SI-SDR / LSD vs clean, RIR EDC error vs true RIR),
and writes the output WAVs — the trained-scale evidence base for every
serving-default decision (reference flow being evidenced:
/root/reference/testing/tester.py:123-164).

Inputs are built exactly like bench.py: 65536-sample crops of the two
reference example utterances, degraded by the true (direct-path-cropped)
RIR via RIROperator — so y = A(x_crop) holds exactly and all programs hit
the same .jax_cache entries as the benchmark.

Usage:
    python scripts/quality_matrix.py CKPT [T] [OUTDIR] [VARIANTS...]
        CKPT     checkpoint path (trainer .npz) or "random" for random init
        T        diffusion steps (default 50)
        OUTDIR   output dir (default quality_out)
        VARIANTS subset of variant names to run (default: all)
Writes OUTDIR/quality.json + per-variant WAVs; QUALITY.md is written by
hand from quality.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from buddy_tpu.utils.device import enable_compilation_cache
from buddy_tpu.config import compose, instantiate
from buddy_tpu.models import NetworkBundle
from buddy_tpu.diffusion.edm import EDM
from buddy_tpu.operators.reverb import RIROperator
from buddy_tpu.operators.subband import BlindSubbandFiltering
from buddy_tpu.data.audio_io import read_wav, write_wav
from buddy_tpu.training import checkpoint as ckpt_lib
from buddy_tpu import evaluation

SR = 16000
AUDIO_LEN = 65536
B = 8

# (name, dtype, int8, static, guidance)
VARIANTS = [
    ("bf16_full", "bfloat16", False, False, "full"),
    ("bf16_identity", "bfloat16", False, False, "identity"),
    ("int8_full", "bfloat16", True, False, "full"),
    ("int8_identity", "bfloat16", True, False, "identity"),
    ("int8static_full", "bfloat16", True, True, "full"),
    ("int8static_identity", "bfloat16", True, True, "identity"),
    ("f32_full", "null", False, False, "full"),
]


def build_inputs():
    """B crops of the two example utterances + aligned degraded versions.
    Returns (cleans (B,L), ys (B,1,L), rirs list of (per-crop true rir))."""
    op_hp = compose("conf_VCTK.yaml", [
        "tester=blind_dereverberation_BUDDy"])[
            "tester"]["informed_dereverberation"]["op_hp"]
    # QM_SPEAKERS=p287 restricts scoring to one speaker (held-out eval:
    # train with dset.train.speakers_discard=["p287"], score only p287)
    utts = [("p226", "p226_003"), ("p287", "p287_005")]
    only = os.environ.get("QM_SPEAKERS")
    if only:
        keep = set(only.split(","))
        utts = [u for u in utts if u[0] in keep]
        assert utts, f"QM_SPEAKERS={only} matched no example utterances"
    data = []
    for spk, utt in utts:
        clean, _ = read_wav(
            f"/root/reference/audio_examples/clean/{spk}/{utt}.wav")
        rir, _ = read_wav(f"/root/reference/audio_examples/rir/{spk}/{utt}.wav")
        rir = rir[int(np.argmax(np.abs(rir))):]
        rir = rir / np.abs(rir).max()
        rb = 4096
        rir = np.pad(rir, (0, ((len(rir) + rb - 1) // rb) * rb - len(rir)))
        data.append((clean, rir))
    cleans, ys, rirs = [], [], []
    per = B // len(utts)
    for (clean, rir) in data:
        max_off = len(clean) - AUDIO_LEN
        offsets = np.linspace(0, max_off, per).astype(int)
        op = RIROperator(op_hp, time_kernel_size=len(rir), sample_rate=SR)
        op.update_params(jnp.asarray(rir))
        for off in offsets:
            seg = np.asarray(clean[off:off + AUDIO_LEN], np.float32)
            seg = 0.05 * seg / seg.std(ddof=1)
            y = np.asarray(op.degradation(jnp.asarray(seg)[None, :]))
            cleans.append(seg)
            ys.append(y)
            rirs.append(rir)
    return np.stack(cleans), jnp.asarray(np.stack(ys)), rirs


def load_trained(network, ckpt_path, x0):
    """init (cache) then overwrite the trainable collection from the ckpt."""
    network.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.float32))
    if ckpt_path == "random":
        return
    ema, it = ckpt_lib.load_any_checkpoint(ckpt_path, prefer_ema=True)
    tree = dict(network.params) if isinstance(network.params, dict) else \
        {"params": network.params}
    src = ema["params"] if isinstance(ema, dict) and "params" in ema else ema
    tree["params"] = jax.tree.map(jnp.asarray, src)
    network.params = tree
    print(f"loaded ema params from {ckpt_path} (it={it})", flush=True)


def run_variant(name, dtype, int8, static, guidance, ckpt_path, ys,
                op_params_b, H_b, T):
    args = compose("conf_VCTK.yaml", [
        "tester=blind_dereverberation_BUDDy",
        f"tester.sampling_params.T={T}",
        f"network.compute_dtype={dtype}",
        f"network.quantize_int8={str(int8).lower()}",
        f"network.quantize_static={str(static).lower()}",
        "network.fuse_resample=true",
        f"tester.posterior_sampling.guidance_jacobian={guidance}",
    ])
    module = instantiate(args["network"])
    edm = EDM(sde_hp=dict(args["diff_params"]["sde_hp"]))
    network = NetworkBundle(module)
    x0 = jnp.zeros((1, 1, AUDIO_LEN), jnp.float32)
    load_trained(network, ckpt_path, x0)
    if static:
        # calibrate on the actual serving inputs over the sigma schedule
        hp = args["diff_params"]["sde_hp"]
        sigmas = np.geomspace(float(hp["sigma_max"]), float(hp["sigma_min"]), 8)
        kx = jax.random.PRNGKey(7)
        xs, cns = [], []
        xc = ys[:1, 0, :][:, None, :]  # (1,1,L) one degraded utterance
        for s in sigmas:
            xn = xc + s * jax.random.normal(kx, xc.shape, jnp.float32)
            sig = jnp.full((1,), s, jnp.float32)
            xs.append(edm.cin(sig)[:, None, None] * xn)
            cns.append(edm.cnoise(sig))
        network.calibrate_quant(xs, cns)
    sampler = instantiate(args["tester"]["sampler"], network, edm, args)
    t0 = time.perf_counter()
    pred = sampler.predict_conditional_batched(
        ys, BLIND_OP, blind=True, rng=jax.random.PRNGKey(11),
        op_params_batch=op_params_b, H_batch=H_b)
    pred = np.asarray(pred)
    wall = time.perf_counter() - t0
    # estimated RIRs from the final per-utterance operator state
    H_fin = BLIND_OP.H
    est_rirs = np.asarray(jax.jit(jax.vmap(BLIND_OP._time_rir_fn))(H_fin))
    return pred, est_rirs, wall


def main():
    enable_compilation_cache()
    ckpt_path = sys.argv[1] if len(sys.argv) > 1 else "random"
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    outdir = sys.argv[3] if len(sys.argv) > 3 else "quality_out"
    only = set(sys.argv[4:])
    os.makedirs(outdir, exist_ok=True)

    cleans, ys, rirs = build_inputs()
    ys_np = np.asarray(ys)

    global BLIND_OP
    op_hp = compose("conf_VCTK.yaml", ["tester=blind_dereverberation_BUDDy"])[
        "tester"]["informed_dereverberation"]["op_hp"]
    BLIND_OP = BlindSubbandFiltering(op_hp, sample_rate=SR)
    op_params_b, H_b = BLIND_OP.reset_batched(jax.random.PRNGKey(3), B)

    results = {}
    # degraded-input floor
    rows = []
    for b in range(B):
        rows.append(evaluation.evaluate_utterance(cleans[b], ys_np[b, 0]))
    results["degraded_input"] = {
        "si_sdr": float(np.mean([r["si_sdr"] for r in rows])),
        "lsd": float(np.mean([r["lsd"] for r in rows])), "wall_s": 0.0}
    print("degraded:", results["degraded_input"], flush=True)

    for (name, dtype, int8, static, guidance) in VARIANTS:
        if only and name not in only:
            continue
        print(f"=== {name} (dtype={dtype} int8={int8} static={static} "
              f"guidance={guidance}) ===", flush=True)
        try:
            pred, est_rirs, wall = run_variant(
                name, dtype, int8, static, guidance, ckpt_path, ys,
                op_params_b, H_b, T)
        except Exception as e:  # noqa: BLE001 — record and continue
            print(f"{name} FAILED: {e}", flush=True)
            results[name] = {"error": str(e)[:200]}
            continue
        rows = []
        for b in range(B):
            rows.append(evaluation.evaluate_utterance(
                cleans[b], pred[b, 0], degraded=ys_np[b, 0],
                true_rir=rirs[b], est_rir=est_rirs[b]))
            write_wav(os.path.join(outdir, f"{name}_utt{b}.wav"),
                      pred[b, 0] / (np.abs(pred[b, 0]).max() + 1e-9), SR)
        results[name] = {
            "si_sdr": float(np.mean([r["si_sdr"] for r in rows])),
            "lsd": float(np.mean([r["lsd"] for r in rows])),
            "rir_edc_rmse_db": float(np.mean(
                [r["rir_edc_rmse_db"] for r in rows])),
            "si_sdr_per_utt": [round(r["si_sdr"], 2) for r in rows],
            "wall_s": round(wall, 2), "T": T, "ckpt": ckpt_path,
        }
        print(name, json.dumps(results[name]), flush=True)
        with open(os.path.join(outdir, "quality.json"), "w") as f:
            json.dump(results, f, indent=1)
    # clean/degraded references once
    for b in range(B):
        write_wav(os.path.join(outdir, f"clean_utt{b}.wav"), cleans[b], SR)
        write_wav(os.path.join(outdir, f"degraded_utt{b}.wav"),
                  ys_np[b, 0] / (np.abs(ys_np[b, 0]).max() + 1e-9), SR)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
