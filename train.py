"""Training entry point — CLI-compatible with the reference's train.py.

Usage (same override grammar as the reference shell wrappers, train.sh):
    python train.py --config-name=conf_VCTK.yaml \
        dset.train.path=/path/to/anechoic/train dset.test.path=/path/to/test

Builds the dataset/network/diff-params/tester/trainer from the Hydra-style
config tree (buddy_tpu/config/conf) and runs the training loop.
"""

import argparse
import os
import sys

import jax


def parse_cli(argv):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--config-name", default="conf_VCTK.yaml")
    known, overrides = parser.parse_known_args(argv)
    return known.config_name, [o for o in overrides if "=" in o]


def _main(args):
    from buddy_tpu.config import instantiate
    from buddy_tpu.models import NetworkBundle
    from buddy_tpu.data.loader import make_train_loader
    from buddy_tpu.testing.tester import Tester
    from buddy_tpu.utils.device import enable_compilation_cache
    from buddy_tpu.parallel.mesh import init_distributed

    enable_compilation_cache()
    if init_distributed():
        print(f"multi-host: process {jax.process_index()} of {jax.process_count()}")

    dirname = os.path.dirname(os.path.abspath(__file__))
    args["model_dir"] = os.path.join(dirname, str(args["model_dir"]))
    os.makedirs(args["model_dir"], exist_ok=True)
    args["exp"]["model_dir"] = args["model_dir"]

    train_set = instantiate(args["dset"]["train"])
    train_loader = make_train_loader(train_set,
                                     batch_size=int(args["exp"]["batch_size"]),
                                     num_workers=int(args["exp"]["num_workers"]),
                                     seed=int(args["exp"]["seed"]))

    try:
        test_set = instantiate(args["dset"]["test"])
    except Exception as e:
        print(f"test set unavailable ({e}); continuing without")
        test_set = None

    diff_params = instantiate(args["diff_params"])
    network = NetworkBundle(instantiate(args["network"]))

    args["tester"]["sampling_params"]["same_as_training"] = True
    tester = Tester(args, network, diff_params, test_set=test_set,
                    in_training=True)

    trainer = instantiate(args["exp"]["trainer"], args, train_loader, network,
                          diff_params, tester)

    print()
    print("Training options:")
    print()
    print(f"Output directory:        {args['model_dir']}")
    print(f"Network architecture:    {args['network']['_target_']}")
    print(f"Dataset:    {args['dset']['train']['_target_']}")
    print(f"Diffusion parameterization:  {args['diff_params']['_target_']}")
    print(f"Batch size:              {args['exp']['batch_size']}")
    print(f"Devices:                 {jax.devices()}")
    print()

    trainer.training_loop()


def main(argv=None):
    from buddy_tpu.config import compose
    config_name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    args = compose(config_name, overrides)
    _main(args)


if __name__ == "__main__":
    main()
