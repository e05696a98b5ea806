#!/bin/bash
# Canonical blind-dereverberation invocation
# (reference: test_blind_dereverberation.sh — same overrides)
export HYDRA_FULL_ERROR=1

ckpt=${CKPT:-experiments/VCTK_16k_4s_time-190000.pt}

tester=blind_dereverberation_BUDDy
conf=conf_VCTK.yaml
name=buddy_wpe-init_noise-prior_N-201_rir-aligned_1exp

PATH_EXPERIMENT=experiments/$name
mkdir -p $PATH_EXPERIMENT
python test.py --config-name=$conf \
            tester=$tester \
            tester.checkpoint=$ckpt \
            tester.sampling_params.T=201 \
            model_dir=$PATH_EXPERIMENT \
            +gpu=0 \
            dset=vctk_16k_4s_test-benchmark \
            dset.test.path=${TESTSET:-/root/reference/audio_examples} \
            dset.test.num_examples=2
