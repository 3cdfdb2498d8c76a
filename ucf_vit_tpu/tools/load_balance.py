"""Offline load-balancing calculator CLI.

Capability parity with reference `utils/load_balance.py`:
  python -m ucf_vit_tpu.tools.load_balance <config.yaml> <num_data_par_ranks>
prints the batches_per_rank_epoch dict and dataset_group_list string to paste
into the config (or set load_balancing.auto_load_balancing: True to compute
in-process at startup, `train_masked_fsdp.py:240-242`).
"""

from __future__ import annotations

import sys

import yaml

from ucf_vit_tpu.data.load_balance import calculate_load_balancing_from_config


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print(__doc__)
        sys.exit(1)
    with open(argv[0]) as f:
        conf = yaml.safe_load(f)
    bpre, groups = calculate_load_balancing_from_config(
        conf, int(argv[1]), verbose=True
    )
    print("USE BELOW IN CONFIG FILE")
    print("batches_per_rank_epoch: {")
    for k, v in bpre.items():
        print(f"  '{k}': {v},")
    print("}")
    print(f"dataset_group_list: '{groups}'")


if __name__ == "__main__":
    main()
