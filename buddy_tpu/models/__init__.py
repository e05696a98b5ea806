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

    def init(self, rng, x, cnoise):
        # Initialize on the host CPU backend: the init program is traced and
        # compiled like any jit, and compiling the full U-Net graph over a
        # remote TPU tunnel costs minutes for a one-off that pure CPU does in
        # seconds.  Params transfer to the accelerator at first use.
        import jax
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            try:
                with jax.default_device(cpu):
                    self.params = self.module.init(rng, x, cnoise)
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

    @property
    def num_params(self) -> int:
        import jax
        import numpy as np
        return int(sum(np.prod(p.shape) for p in jax.tree.leaves(self.params)))


__all__ = ["NCSNpp", "NCSNppTime", "NCSNppTimeModule", "NetworkBundle"]
