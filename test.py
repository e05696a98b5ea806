"""Inference entry point — CLI-compatible with the reference's test.py.

Usage (see test_blind_dereverberation.sh / test_informed_dereverberation.sh):
    python test.py --config-name=conf_VCTK.yaml tester=blind_dereverberation_BUDDy \
        tester.checkpoint=<ckpt> dset=vctk_16k_4s_test-benchmark \
        dset.test.path=/root/reference/audio_examples dset.test.num_examples=2
"""

import os
import sys

from train import parse_cli


def _main(args):
    from buddy_tpu.config import instantiate
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.testing.tester import Tester
    from buddy_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()

    dirname = os.path.dirname(os.path.abspath(__file__))
    args["model_dir"] = os.path.join(dirname, str(args["model_dir"]))
    if not os.path.exists(args["model_dir"]):
        raise Exception(f"Model directory {args['model_dir']} does not exist")
    args["exp"]["model_dir"] = args["model_dir"]

    diff_params = instantiate(args["diff_params"])
    network = NetworkBundle(instantiate(args["network"]))

    test_set = instantiate(args["dset"]["test"])
    tester = Tester(args=args, network=network, diff_params=diff_params,
                    test_set=test_set)

    print()
    print("Test options:")
    print()
    print(f"Output directory:        {args['model_dir']}")
    print(f"Network architecture:    {args['network']['_target_']}")
    print(f"Diffusion parameterization:  {args['diff_params']['_target_']}")
    print(f"Experiment:              {args['exp']['exp_name']}")
    print(f"Sampler:                 {args['tester']['sampler']['_target_']}")
    print(f"Checkpoint:              {args['tester']['checkpoint']}")
    print()

    checkpoint = args["tester"]["checkpoint"]
    if checkpoint not in (None, "None"):
        try:
            tester.load_checkpoint(os.path.join(dirname, checkpoint))
        except Exception:
            tester.load_checkpoint(os.path.join(args["model_dir"], checkpoint))
    else:
        print("trying to load latest checkpoint")
        tester.load_latest_checkpoint()

    tester.do_test()


def main(argv=None):
    from buddy_tpu.config import compose
    config_name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    # the reference passes +gpu=N; accept and ignore (device selection is
    # JAX_PLATFORMS / mesh-driven here)
    overrides = [o for o in overrides if not o.lstrip("+").startswith("gpu=")]
    args = compose(config_name, overrides)
    _main(args)


if __name__ == "__main__":
    main()
