from buddy_tpu.models.ncsnpp import NCSNpp, NCSNppTime, NCSNppTimeModule


class NetworkBundle:
    """A flax module + its parameter pytree, presented as a callable net.

    The samplers thread ``bundle.params`` explicitly through their jitted
    programs (so reloading a checkpoint never recompiles); the trainer swaps
    ``params`` after each update for evaluation-in-training.
    """

    def __init__(self, module, params=None):
        self.module = module
        self.params = params

    def __call__(self, x, cnoise):
        return self.module.apply(self.params, x, cnoise)

    def init(self, rng, x, cnoise, cache_dir: str | None = None):
        # Initialize on the host CPU backend: the init program is traced and
        # compiled like any jit, and compiling the full U-Net graph over a
        # remote TPU tunnel costs minutes for a one-off that pure CPU does in
        # seconds.  Params transfer to the accelerator at first use.
        #
        # Even the CPU init compile costs minutes for the production U-Net on
        # a small host (BENCH_r01: 136 s of bench setup), so the initialized
        # pytree is cached on disk keyed by (module config, input spec, seed)
        # — a warm start loads it in seconds.  Opt out: BUDDY_PARAM_CACHE=0.
        import jax
        import jax.numpy as jnp
        cached = self._load_param_cache(rng, x, cnoise, cache_dir)
        if cached is None:
            # A static-quant config only adds a "quant" collection of zero
            # scalars to the init tree — if the non-static entry is cached,
            # synthesize the quant zeros from an eval_shape trace (seconds)
            # instead of paying the full cold host init (11-49 min).
            base = self._load_param_cache(rng, x, cnoise, cache_dir,
                                          force_static=False)
            if base is not None and "quant" not in base:
                import numpy as np
                struct = jax.eval_shape(self.module.init, rng, x, cnoise)
                struct = (dict(struct) if not isinstance(struct, dict)
                          else struct)
                if "quant" in struct:
                    base = dict(base)
                    base["quant"] = jax.tree.map(
                        lambda s: np.zeros(s.shape, s.dtype), struct["quant"])
                    cached = base
                    # Persist under the static key so the next cold process
                    # loads it directly instead of re-paying the eval_shape
                    # synthesis (~71 s for the production net).
                    self._save_param_cache(rng, x, cnoise, cache_dir,
                                           tree=cached)
        if cached is not None:
            # Single visible device (the TPU tunnel): pack all leaves into
            # ONE host buffer, one transfer, and slice apart on device — the
            # leaf-by-leaf path costs a tunnel round-trip per leaf (~115 s of
            # BENCH_r03 setup for 111 MB / ~300 leaves).  Multi-device
            # backends keep the uncommitted leaf-by-leaf transfer: an
            # explicit device placement would *commit* the params to one
            # device and poison any later jit that spans a multi-device mesh
            # (the dp-sharded tester / unconditional sampling).
            if len(jax.devices()) == 1:
                packed = self._packed_transfer(cached)
                if packed is not None:
                    self.params = packed
                    return self.params
            self.params = jax.tree.map(jnp.asarray, cached)
            return self.params
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            try:
                with jax.default_device(cpu):
                    self.params = self.module.init(rng, x, cnoise)
                self._save_param_cache(rng, x, cnoise, cache_dir)
                # pin to the accelerator: params left on the host would be
                # re-transferred on every apply (111 MB/call over the tunnel)
                default = jax.devices()[0]
                if default != cpu:
                    self.params = jax.device_put(self.params, default)
            except ValueError:
                # Pallas kernels can't lower on the CPU backend — init on the
                # default device instead, under jit (eager pallas dispatch is
                # broken on the axon backend)
                self.params = jax.jit(self.module.init)(rng, x, cnoise)
        else:
            self.params = self.module.init(rng, x, cnoise)
        return self.params

    @staticmethod
    def _packed_transfer(tree):
        """One-buffer host->device transfer of a host pytree, or None if the
        leaves aren't uniformly f32 (then the caller falls back)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        if not leaves or any(np.asarray(l).dtype != np.float32 for l in leaves):
            return None
        specs = [(l.shape, int(np.prod(l.shape, dtype=np.int64))) for l in leaves]
        buf = jnp.asarray(np.concatenate(
            [np.ravel(np.asarray(l)) for l in leaves]))

        def unpack(b):
            out, off = [], 0
            for shape, size in specs:
                out.append(b[off:off + size].reshape(shape))
                off += size
            return out
        return jax.tree_util.tree_unflatten(treedef, jax.jit(unpack)(buf))

    # --- init-params disk cache (cold-start: VERDICT r2 item 6) ----------

    # Module fields that only affect apply(), never the init variable tree
    # (verified: the f32 and int8 init caches are byte-identical).  Stripped
    # from the cache key so one entry serves every precision/fusion variant
    # of the same architecture — a full cold host init of the production
    # U-Net costs 11-49 min on the 1-core box.
    _APPLY_ONLY_FIELDS = ("compute_dtype", "quantize_int8", "quantize_accum",
                          "quantize_bwd", "quantize_static", "fuse_resample",
                          "remat")

    def _param_cache_path(self, rng, x, cnoise, cache_dir, force_static=None):
        import hashlib
        import os
        import re
        if os.environ.get("BUDDY_PARAM_CACHE", "1") == "0":
            return None
        import numpy as np
        cache_dir = cache_dir or os.environ.get(
            "BUDDY_PARAM_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".param_cache"))
        rep = repr(self.module)
        for f in self._APPLY_ONLY_FIELDS:
            rep = re.sub(rf"\b{f}\s*=\s*[^,)\n]*", f"{f}=*", rep)  # field = value
            rep = re.sub(rf"\('{f}', [^)]*\)", f"('{f}', *)", rep)  # net_kwargs
        # quantize_static=True DOES add a "quant" variable collection at
        # init (ops/qconv.py), but only when the QConvs are live:
        cfg = dict(getattr(self.module, "net_kwargs", ()) or ())
        get = lambda f: cfg.get(f, getattr(self.module, f, False))
        static_init = bool(get("quantize_int8") and get("quantize_static"))
        if force_static is not None:
            static_init = force_static
        # "pc" = per-channel a_scale vectors (round 4) — older scalar-quant
        # cache entries must not load into the per-channel variable shapes
        static_init = "pc" if static_init else False
        spec = (f"{rep}|static_init={static_init}|{tuple(x.shape)}|{x.dtype}|"
                f"{tuple(cnoise.shape)}|{np.asarray(rng).tobytes().hex()}")
        key = hashlib.sha1(spec.encode()).hexdigest()[:20]
        return os.path.join(cache_dir, f"init-{key}.npz")

    def _load_param_cache(self, rng, x, cnoise, cache_dir, force_static=None):
        import os
        path = self._param_cache_path(rng, x, cnoise, cache_dir, force_static)
        if path is None or not os.path.exists(path):
            return None
        import numpy as np
        try:
            with np.load(path) as z:
                flat = {k: z[k] for k in z.files}
        except Exception:
            return None
        tree: dict = {}
        for k, v in flat.items():
            node = tree
            *parents, leaf = k.split("/")
            for p in parents:
                node = node.setdefault(p, {})
            node[leaf] = v
        return tree

    def _save_param_cache(self, rng, x, cnoise, cache_dir, tree=None):
        import os
        path = self._param_cache_path(rng, x, cnoise, cache_dir)
        if path is None:
            return
        import jax
        import numpy as np
        if tree is None:
            tree = self.params
        flat = {}
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = "/".join(getattr(p, "key", str(p)) for p in kp)
            arr = np.asarray(leaf)
            if arr.dtype == np.dtype("bfloat16"):  # npz can't store bf16
                return
            flat[name] = arr
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp.npz"  # savez appends .npz unless already present
        np.savez(tmp, **flat)
        os.replace(tmp, path)

    def calibrate_quant(self, xs, cnoises) -> None:
        """Calibrate int8 activation scales (QConv ``quant/a_scale``).

        Runs the module on each (x, cnoise) pair with the "quant" collection
        mutable; every QConv maxes the observed |activation| into its scale
        variable.  Afterwards, applies with ``quantize_static=True`` read the
        calibrated scales instead of recomputing max|x| per call (the dynamic
        reduce was ~9.6 ms of a 209 ms blind-DPS step at B=8).
        """
        import jax
        assert self.params is not None, "init() before calibrate_quant()"
        apply = jax.jit(lambda v, x, t: self.module.apply(
            v, x, t, mutable=["quant"])[1]["quant"])
        variables = dict(self.params)
        for x, t in zip(xs, cnoises):
            variables["quant"] = apply(variables, x, t)
        self.params = variables

    @property
    def num_params(self) -> int:
        import jax
        import numpy as np
        return int(sum(np.prod(p.shape) for p in jax.tree.leaves(self.params)))


__all__ = ["NCSNpp", "NCSNppTime", "NCSNppTimeModule", "NetworkBundle"]
