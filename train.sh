#!/bin/bash
# Canonical training invocation (reference: train.sh)
export HYDRA_FULL_ERROR=1

python train.py --config-name=conf_VCTK.yaml \
            dset.train.path=/your/path/to/anechoic/training/set \
            dset.test.path=/your/path/to/anechoic/testing/set
