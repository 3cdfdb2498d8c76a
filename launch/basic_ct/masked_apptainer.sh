#!/bin/bash
# basic_ct MAE pretrain inside the apptainer image — analog of the
# reference's launch/basic_ct/masked_simple_apptainer.sh, re-targeted at
# the JAX/TPU stack. SIF=path/to.sif to override.
source "$(dirname "$0")/../_common.sh"
apptainer_run configs/basic_ct/mae/base_config.yaml "$@"
