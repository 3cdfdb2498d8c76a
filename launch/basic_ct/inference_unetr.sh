#!/bin/bash
# UNETR segmentation inference/eval (reference
# launch/basic_ct/inference_unetr_simple.sh analog).
set -euo pipefail
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
python -m ucf_vit_tpu.inference configs/basic_ct/unetr/base_config.yaml "$@"
