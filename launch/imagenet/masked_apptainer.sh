#!/bin/bash
# imagenet MAE pretrain inside the apptainer image — analog of the
# reference's launch/imagenet/masked_simple_apptainer.sh (and the basic_ct
# variant), re-targeted at the JAX/TPU stack. SIF=path/to.sif to override.
source "$(dirname "$0")/../_common.sh"
apptainer_run configs/imagenet/mae/base_config.yaml "$@"
