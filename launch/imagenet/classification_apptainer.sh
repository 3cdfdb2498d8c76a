#!/bin/bash
# imagenet classification inside the apptainer image — analog of the
# reference's launch/imagenet/classification_simple_apptainer.sh.
source "$(dirname "$0")/../_common.sh"
apptainer_run configs/imagenet/classification/base_config.yaml "$@"
