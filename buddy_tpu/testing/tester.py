"""Inference driver: unconditional sampling + informed/blind dereverberation.

Parity target: testing/tester.py in the reference — mode dispatch over
``args.tester.modes``, per-file loop that (1) normalizes the clean input to
sigma_data scale, (2) synthesizes the observation with the *true* RIR,
(3) optionally builds a noise-initialized blind subband operator, (4) runs
guided sampling, and (5) writes original/degraded/reconstructed/true-RIR/
estimated-RIR WAV sets into a dated directory layout (tester.py:123-236).

TPU-specific addition: variable-length utterances are bucket-padded to a
multiple of ``bucket`` samples so the jitted sampling program compiles once
per bucket instead of once per utterance length (BASELINE config 5:
long-utterance chunked inference; SURVEY.md §7 hard part #4).
"""

from __future__ import annotations

import json
import os
from datetime import date

import numpy as np

import jax
import jax.numpy as jnp

from buddy_tpu.config import instantiate, save_config
import buddy_tpu.utils.log as utils_logging
from buddy_tpu.operators.reverb import RIROperator
from buddy_tpu.operators.subband import BlindSubbandFiltering


def _std(x):
    return float(np.std(np.asarray(x), ddof=1))


class Tester:
    def __init__(self, args, network, diff_params, test_set=None, device=None,
                 in_training=False, rng=None):
        self.args = args
        self.network = network  # NetworkBundle
        self.diff_params = diff_params
        self.device = device
        self.test_set = test_set
        self.in_training = in_training
        self.it = 0
        self.rng = rng if rng is not None else jax.random.PRNGKey(42)
        # bucket granularity for variable-length inference (samples)
        self.bucket = int(args["tester"].get("bucket_pad", 16384))

        self.sampler = instantiate(args["tester"]["sampler"],
                                   self.network, self.diff_params, self.args)

    # ------------------------------------------------------------------
    # checkpoint loading (tester.py:34-97)
    # ------------------------------------------------------------------
    def load_checkpoint(self, path) -> bool:
        """Load network weights from a torch ``.pt`` (converted on the fly)
        or a buddy_tpu Orbax/npz checkpoint; prefers EMA weights."""
        from buddy_tpu.training.checkpoint import load_any_checkpoint
        params, it = load_any_checkpoint(path, prefer_ema=True)
        self.network.params = params
        self.it = it
        print(f"loaded checkpoint {path} (it={it})")
        return True

    def load_latest_checkpoint(self) -> bool:
        from buddy_tpu.training.checkpoint import find_latest_checkpoint
        path = find_latest_checkpoint(self.args["model_dir"],
                                      self.args["exp"]["exp_name"])
        if path is None:
            raise ValueError("No checkpoint found")
        return self.load_checkpoint(path)

    # ------------------------------------------------------------------
    # unconditional sampling (tester.py:104-113)
    # ------------------------------------------------------------------
    def sample_unconditional(self, mode):
        tcfg = self.args["tester"]
        audio_len = int(tcfg["unconditional"].get("audio_len",
                                                  self.args["exp"]["audio_len"]))
        shape = (int(tcfg["unconditional"]["num_samples"]), audio_len)
        self.rng, k = jax.random.split(self.rng)
        # shard the sample batch over the dp mesh when it divides evenly
        sharding = None
        if jax.device_count() > 1 and shape[0] % jax.device_count() == 0:
            from buddy_tpu.parallel.mesh import make_mesh, batch_sharding
            sharding = batch_sharding(make_mesh(jax.device_count()))
        preds = self.sampler.predict_unconditional(shape, rng=k,
                                                   sharding=sharding)
        if not self.in_training:
            for i in range(len(preds)):
                utils_logging.write_audio_file(
                    preds[i], self.args["exp"]["sample_rate"],
                    f"unconditional_{i}", path=self.paths["unconditional"])
        return preds

    # ------------------------------------------------------------------
    # dereverberation (tester.py:123-164)
    # ------------------------------------------------------------------
    def _bucket_pad(self, n: int) -> int:
        b = self.bucket
        return ((n + b - 1) // b) * b if b > 0 else n

    # ------------------------------------------------------------------
    # chunked-STFT inference for long utterances (BASELINE config 5)
    # ------------------------------------------------------------------
    def _predict_chunked(self, y, operator, blind: bool, n: int):
        """Overlap-add chunked guided sampling.

        Utterances beyond ``tester.chunked.threshold`` samples are processed
        in fixed-size chunks with hann-crossfaded overlap — one compiled
        program regardless of utterance length.  In blind mode the subband
        filter is estimated on the FIRST chunk and reused (informed-subband
        mode) for the rest: the RIR is a global property of the room, so
        re-estimating per chunk wastes compute and risks inconsistency.
        """
        ccfg = self.args["tester"].get("chunked", {})
        cs = int(ccfg.get("chunk_size", 131072))
        ov = int(ccfg.get("overlap", 16384))
        hop = cs - ov
        n_chunks = max(1, int(np.ceil(max(n - ov, 1) / hop)))
        total = (n_chunks - 1) * hop + cs

        y_np = np.zeros((y.shape[0], total), np.float32)
        y_np[:, :n] = np.asarray(y)[:, :n]

        ramp = 0.5 * (1 - np.cos(np.pi * np.arange(ov) / ov)) if ov > 0 else None
        window = np.ones(cs, np.float32)
        if ov > 0:
            window[:ov] = ramp
            window[-ov:] = ramp[::-1]

        out = np.zeros(total, np.float32)
        wsum = np.zeros(total, np.float32)
        for c in range(n_chunks):
            start = c * hop
            y_c = jnp.asarray(y_np[:, start:start + cs])
            self.rng, k = jax.random.split(self.rng)
            chunk_blind = blind and c == 0
            pred_c = np.asarray(self.sampler.predict_conditional(
                y_c, operator, shape=(1, cs), blind=chunk_blind, rng=k))[0]
            w = window.copy()
            if c == 0:
                w[:ov] = 1.0       # no left neighbor
            if c == n_chunks - 1:
                w[-ov:] = 1.0 if n_chunks == 1 else w[-ov:]
            out[start:start + cs] += pred_c * w
            wsum[start:start + cs] += w
        out = out / np.maximum(wsum, 1e-8)
        return out[None, :n]

    def _prepare_item(self, i, scaling):
        """Normalize + degrade one test item (shared by serial and batched
        paths). Returns (seg, rir, rir_padded, y, filename, n, n_pad)."""
        exp = self.args["exp"]
        tcfg = self.args["tester"]
        original, rir, filename = self.test_set[i]
        seg = np.asarray(original, np.float32)
        seg = scaling * seg / _std(seg)  # normalize to sigma_data scale
        rir = np.asarray(rir, np.float32)
        # zero-pad the RIR to a bucket so the informed-DPS program
        # compiles once per RIR-length bucket (conv result is unchanged)
        rb = 4096
        rir_padded = np.pad(rir, (0, ((len(rir) + rb - 1) // rb) * rb - len(rir)))

        # forward pass with the true RIR
        operator_ref = RIROperator(tcfg["informed_dereverberation"]["op_hp"],
                                   time_kernel_size=rir.shape[-1],
                                   sample_rate=exp["sample_rate"])
        operator_ref.update_params(jnp.asarray(rir_padded))
        y = operator_ref.degradation(jnp.asarray(seg)[None, :])
        n = seg.shape[-1]
        return seg, rir, rir_padded, np.asarray(y), filename, n, self._bucket_pad(n), operator_ref

    def _write_item_outputs(self, mode, seg, y, pred, rir, filename, est_rir=None):
        exp = self.args["exp"]
        base = os.path.basename(filename)[:-4]
        fs = exp["sample_rate"]
        utils_logging.write_audio_file(seg, fs, base, path=self.paths[mode + "original"])
        utils_logging.write_audio_file(np.asarray(y), fs, base,
                                       path=self.paths[mode + "degraded"])
        path_rec = utils_logging.write_audio_file(
            pred, fs, base, path=self.paths[mode + "reconstructed"])
        utils_logging.write_audio_file(rir, fs, base, path=self.paths[mode + "true_rir"])
        if est_rir is not None:
            utils_logging.write_audio_file(
                est_rir, fs, base, path=self.paths[mode + "estimated_rir"])
        print(path_rec)
        if self.args["tester"].get("evaluate", {}).get("use", False):
            self._write_metrics(mode, base, seg, y, pred, rir, est_rir)

    def _write_metrics(self, mode, base, seg, y, pred, rir, est_rir):
        """Objective metrics per utterance -> <mode dir>/metrics.jsonl.

        The reference computes no scores (pesq/pystoi in requirements but
        never imported — BASELINE.md); SI-SDR/LSD/RIR-EDC here are a strict
        addition, gated off by default."""
        from buddy_tpu import evaluation
        m = evaluation.evaluate_utterance(
            seg, np.asarray(pred).reshape(-1),
            degraded=np.asarray(y).reshape(-1),
            true_rir=rir, est_rir=est_rir)
        m["file"] = base
        path = os.path.join(os.path.dirname(self.paths[mode + "reconstructed"]),
                            "metrics.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                                for k, v in m.items()}) + "\n")
        print(f"  metrics: si_sdr={m['si_sdr']:.2f} dB "
              f"(degraded {m['si_sdr_degraded']:.2f}), lsd={m['lsd']:.2f}")

    def test_dereverberation_batched(self, mode, blind=False):
        """Batched full-test-set dereverberation (BASELINE config 5).

        Utterances are bucket-padded and grouped by (padded length, RIR
        bucket); each group runs through ``predict_conditional_batched`` —
        one vmapped program over B utterances instead of B serial runs.
        Partial groups are padded by repeating the last utterance (the jit
        cache stays bounded by bucket count, not utterance count).
        """
        exp = self.args["exp"]
        tcfg = self.args["tester"]
        scaling = float(tcfg["posterior_sampling"]["warm_initialization"]["scaling_factor"])
        batch_size = int(tcfg["batched"].get("batch_size", 4))
        chunk_threshold = int(tcfg.get("chunked", {}).get("threshold", 163840))

        # multi-chip: shard the utterance batch over the dp mesh so each
        # device runs B/dp utterances of the same vmapped program
        # (tester.batched.shard, on by default when >1 device is visible)
        mesh = None
        if tcfg["batched"].get("shard", True) and jax.device_count() > 1:
            from buddy_tpu.parallel.mesh import make_mesh, batch_sharding
            dp = jax.device_count()
            if batch_size % dp == 0:
                mesh = make_mesh(dp)
                self._batch_sharding = batch_sharding(mesh)

        def _place(tree):
            """Shard over dp when the (possibly tail-short) batch divides."""
            if mesh is None:
                return tree
            leaves = jax.tree.leaves(tree)
            if not leaves or leaves[0].shape[0] % mesh.devices.size != 0:
                return tree
            return jax.device_put(tree, self._batch_sharding)

        operator_blind = None
        if blind:
            assert tcfg["blind_dereverberation"]["operator"] == "subband_filtering"
            operator_blind = BlindSubbandFiltering(
                tcfg["informed_dereverberation"]["op_hp"],
                sample_rate=exp["sample_rate"])

        items = [self._prepare_item(i, scaling) for i in range(len(self.test_set))]

        # long utterances keep the chunked overlap-add path
        long_items = [it for it in items if it[5] > chunk_threshold]
        items = [it for it in items if it[5] <= chunk_threshold]

        groups: dict = {}
        for it in items:
            key = (it[6],) if blind else (it[6], it[2].shape[-1])
            groups.setdefault(key, []).append(it)

        for key, group in groups.items():
            n_pad = key[0]
            for s in range(0, len(group), batch_size):
                batch = group[s:s + batch_size]
                b_real = len(batch)
                B = min(batch_size, max(b_real, 1))
                while len(batch) < B:  # repeat-pad the tail batch
                    batch.append(batch[-1])
                ys = np.zeros((B, 1, n_pad), np.float32)
                for b, it in enumerate(batch):
                    ys[b, :, :it[5]] = it[3][:, :it[5]]
                ys = _place(jnp.asarray(ys))

                self.rng, k_op, k_pred = jax.random.split(self.rng, 3)
                if blind:
                    operator = operator_blind
                    op_params_b, H_b = operator.reset_batched(k_op, B)
                    preds = self.sampler.predict_conditional_batched(
                        ys, operator, blind=True, rng=k_pred,
                        op_params_batch=_place(op_params_b),
                        H_batch=_place(H_b))
                else:
                    operator = batch[0][7]  # any RIROperator (stateless apply)
                    H_b = jnp.asarray(np.stack([it[2] for it in batch]))
                    preds = self.sampler.predict_conditional_batched(
                        ys, operator, blind=False, rng=k_pred,
                        H_batch=_place(H_b))
                preds = np.asarray(preds)

                for b, it in enumerate(batch[:b_real]):
                    seg, rir, _rp, y, filename, n, _np, _op = it
                    est = None
                    if blind:
                        est = np.asarray(
                            operator.get_time_RIR(H=operator.H[b]))
                    self._write_item_outputs(mode, seg, y, preds[b, ..., :n],
                                             rir, filename, est_rir=est)

        for it in long_items:  # serial chunked fallback
            seg, rir, _rp, y, filename, n, _npad, operator_ref = it
            if blind:
                self.rng, k_op = jax.random.split(self.rng)
                operator = operator_blind
                operator.reset(k_op)
            else:
                operator = operator_ref
            pred = self._predict_chunked(jnp.asarray(y), operator, blind, n)
            est = None
            if blind:
                est = np.asarray(operator.get_time_RIR(H=operator.H))
            self._write_item_outputs(mode, seg, y, pred, rir, filename, est_rir=est)

    def test_dereverberation(self, mode, blind=False):
        if self.test_set is None:
            print("No test set specified")
            return
        if len(self.test_set) == 0:
            print("No samples found in test set")
            return

        exp = self.args["exp"]
        tcfg = self.args["tester"]
        if tcfg.get("batched", {}).get("use", False):
            return self.test_dereverberation_batched(mode, blind=blind)
        scaling = float(tcfg["posterior_sampling"]["warm_initialization"]["scaling_factor"])

        operator_blind = None
        if blind:
            assert tcfg["blind_dereverberation"]["operator"] == "subband_filtering"
            # one operator instance for the whole set: per-utterance state is
            # threaded through the jitted program, so the compile cache holds
            operator_blind = BlindSubbandFiltering(
                tcfg["informed_dereverberation"]["op_hp"],
                sample_rate=exp["sample_rate"])

        for i in range(len(self.test_set)):
            original, rir, filename = self.test_set[i]
            seg = np.asarray(original, np.float32)
            seg = scaling * seg / _std(seg)  # normalize to sigma_data scale
            rir = np.asarray(rir, np.float32)
            # zero-pad the RIR to a bucket so the informed-DPS program
            # compiles once per RIR-length bucket (conv result is unchanged)
            rb = 4096
            rir_padded = np.pad(rir, (0, ((len(rir) + rb - 1) // rb) * rb - len(rir)))

            # forward pass with the true RIR
            operator_ref = RIROperator(tcfg["informed_dereverberation"]["op_hp"],
                                       time_kernel_size=rir.shape[-1],
                                       sample_rate=exp["sample_rate"])
            operator_ref.update_params(jnp.asarray(rir_padded))
            y = operator_ref.degradation(jnp.asarray(seg)[None, :])

            # bucket-pad for a bounded jit cache over utterance lengths
            n = seg.shape[-1]
            n_pad = self._bucket_pad(n)
            y_padded = jnp.pad(y, ((0, 0), (0, n_pad - n)))

            if blind:
                self.rng, k_op = jax.random.split(self.rng)
                operator = operator_blind
                operator.reset(k_op)
            else:
                operator = operator_ref

            chunk_threshold = int(tcfg.get("chunked", {}).get("threshold", 163840))
            if n > chunk_threshold:
                pred = self._predict_chunked(y, operator, blind, n)
            else:
                self.rng, k_pred = jax.random.split(self.rng)
                pred = self.sampler.predict_conditional(
                    y_padded, operator, shape=(1, n_pad), blind=blind, rng=k_pred)
                pred = np.asarray(pred)[..., :n]

            est_rir = None
            if blind:
                est_rir = np.asarray(operator.get_time_RIR(H=operator.H))
            self._write_item_outputs(mode, seg, y, pred, rir, filename,
                                     est_rir=est_rir)

    # ------------------------------------------------------------------
    # directory layout (tester.py:167-207)
    # ------------------------------------------------------------------
    def prepare_directories(self, mode, unconditional=False, blind=False):
        today = date.today()
        self.paths = {}
        overriden = self.args["tester"].get("overriden_name", None)
        if overriden is not None and overriden != "None":
            self.path_sampling = os.path.join(self.args["model_dir"], overriden)
        else:
            self.path_sampling = os.path.join(
                self.args["model_dir"], "test" + today.strftime("%d_%m_%Y"))
        os.makedirs(self.path_sampling, exist_ok=True)

        self.paths[mode] = os.path.join(self.path_sampling, mode,
                                        self.args["exp"]["exp_name"])
        os.makedirs(self.paths[mode], exist_ok=True)
        if not unconditional:
            for sub in ("original", "degraded", "reconstructed"):
                p = os.path.join(self.paths[mode], sub)
                os.makedirs(p, exist_ok=True)
                self.paths[mode + sub] = p
            if "dereverberation" in mode:
                p = os.path.join(self.paths[mode], "true_rir")
                os.makedirs(p, exist_ok=True)
                self.paths[mode + "true_rir"] = p
                if mode == "blind_dereverberation":
                    p = os.path.join(self.paths[mode], "estimated_rir")
                    os.makedirs(p, exist_ok=True)
                    self.paths[mode + "estimated_rir"] = p

    def save_experiment_args(self, mode):
        save_config(self.args, os.path.join(self.paths[mode], ".argv"))

    # ------------------------------------------------------------------
    def do_test(self, it=0):
        self.it = it
        for m in self.args["tester"]["modes"]:
            if m == "unconditional":
                print("testing unconditional")
                if not self.in_training:
                    self.prepare_directories(m, unconditional=True)
                    self.save_experiment_args(m)
                return self.sample_unconditional(m)
            elif m == "informed_dereverberation":
                print("testing informed dereverberation")
                if not self.in_training:
                    self.prepare_directories(m)
                    self.save_experiment_args(m)
                self.test_dereverberation(m)
            elif m == "blind_dereverberation":
                print("testing blind dereverberation")
                if not self.in_training:
                    self.prepare_directories(m)
                    self.save_experiment_args(m)
                self.test_dereverberation(m, blind=True)
            else:
                print("Warning: unknown mode: ", m)
