"""Typed YAML config loader with the reference's config surface.

The reference re-extracts ~40 keys by hand in every training script with
inline asserts (`train_masked_fsdp.py:83-245`); this is the single loader
replacing that. Sections (parity: `configs/*/base_config.yaml`):
  trainer / parallelism / model (incl. net.init_args) / data /
  dataset_options / load_balancing

Validation asserts mirror the reference's nets
(`train_class_simple.py:162-180`, `train_masked_fsdp.py:214-238`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import yaml


def is_power_of_two(n: int) -> bool:
    return (n != 0) and (n & (n - 1) == 0)


@dataclass
class Config:
    raw: Dict[str, Any]
    task: str  # classification | mae | unetr | sap | diffusion

    # ------------------------------------------------------------ accessors

    @property
    def trainer(self) -> Dict[str, Any]:
        return self.raw.get("trainer", {})

    @property
    def parallelism(self) -> Dict[str, Any]:
        return self.raw.get("parallelism", {})

    @property
    def model(self) -> Dict[str, Any]:
        return self.raw.get("model", {})

    @property
    def init_args(self) -> Dict[str, Any]:
        return self.model.get("net", {}).get("init_args", {})

    @property
    def data(self) -> Dict[str, Any]:
        return self.raw.get("data", {})

    @property
    def load_balancing(self) -> Dict[str, Any]:
        return self.raw.get("load_balancing", {})

    @property
    def dataset_options(self) -> Dict[str, Any]:
        return self.raw.get("dataset_options", {})

    # --------------------------------------------------------------- derived

    @property
    def twoD(self) -> bool:
        return bool(self.init_args.get("twoD", True))

    @property
    def tile_size(self) -> List[int]:
        return list(self.init_args["tile_size"])

    @property
    def patch_size(self) -> int:
        return int(self.init_args["patch_size"])

    @property
    def adaptive_patching(self) -> bool:
        return bool(self.init_args.get("adaptive_patching", False))

    @property
    def fixed_length(self) -> Optional[int]:
        if not self.adaptive_patching:
            return None
        return int(self.init_args["fixed_length"])

    @property
    def sqrt_len(self) -> Optional[int]:
        fl = self.fixed_length
        if fl is None:
            return None
        nd = 2 if self.twoD else 3
        return int(round(fl ** (1.0 / nd)))

    @property
    def data_par_size(self) -> int:
        # Number of batch shards = every axis the mesh lays the batch over
        # (mesh.DATA_AXES = ddp, ep, fsdp): ep devices each consume distinct
        # data so the dense parts stay busy under expert parallelism.
        p = self.parallelism
        return (
            int(p.get("fsdp_size", 1))
            * int(p.get("simple_ddp_size", 1))
            * int(p.get("expert_par_size", 1))
        )

    @property
    def world_size(self) -> int:
        p = self.parallelism
        return (
            self.data_par_size
            * int(p.get("tensor_par_size", 1))
            * int(p.get("seq_par_size", 1))
            * int(p.get("pipe_par_size", 1))
        )

    @property
    def batch_size(self) -> int:
        return int(self.data["batch_size"])

    @property
    def dataset(self) -> str:
        return self.data.get("dataset", "imagenet")

    @property
    def default_vars(self) -> List[str]:
        return list(self.init_args.get("default_vars", []))

    @property
    def single_channel(self) -> bool:
        return bool(self.data.get("single_channel", False))

    @property
    def max_channels(self) -> int:
        """in_chans for the model (parity: `train_unetr_simple.py:237-243`)."""
        if self.single_channel:
            return 1
        mx = 1
        for k, v in self.data.get("num_channels_used", {}).items():
            if v > 1:
                mx = v
        return mx

    # ------------------------------------------------------------ validation

    def validate(self) -> None:
        ts = self.tile_size
        p = self.patch_size
        nd = 2 if self.twoD else 3
        for i in range(min(len(ts), 3)):
            assert ts[i] % p == 0, f"tile_size[{i}] % patch_size must be 0"
        if self.adaptive_patching:
            for i in range(nd):
                assert is_power_of_two(ts[i]), "tile sizes must be powers of 2"
            fl = self.fixed_length
            if self.twoD:
                assert fl % 3 == 1 % 3, "quadtree fixed_length must be 3n+1"
            else:
                assert fl % 7 == 1, "octree fixed_length must be 7n+1"
            if self.task in ("unetr", "sap"):
                root = fl ** (1.0 / nd)
                assert abs(round(root) - root) < 1e-4, (
                    "fixed_length must be a perfect square/cube for sqrt-len tasks"
                )
        heads = int(self.init_args.get("num_heads", 12))
        tp = int(self.parallelism.get("tensor_par_size", 1))
        assert heads % tp == 0, "num_heads must divide by tensor_par_size"
        emb = int(self.init_args.get("embed_dim", 768))
        assert emb % heads == 0, "embed_dim must divide by num_heads"
        pp = int(self.parallelism.get("pipe_par_size", 1))
        if pp > 1:
            depth = int(self.init_args.get("depth", 12))
            assert depth % pp == 0, (
                f"depth {depth} must divide by pipe_par_size {pp}"
            )
            if self.task in ("mae", "diffusion") and not bool(
                self.init_args.get("linear_decoder", False)
            ):
                # the MAE/DiffusionVIT decoder stacks are pipelined too
                dd = int(self.init_args.get("decoder_depth", 8))
                assert dd % pp == 0, (
                    f"decoder_depth {dd} must divide by pipe_par_size {pp}"
                )
            assert int(self.parallelism.get("seq_par_size", 1)) == 1, (
                "pipe_par_size > 1 with seq_par_size > 1 is not supported "
                "(the pipelined schedule cannot nest the sequence-parallel "
                "attention's own manual region)"
            )
        moe_e = int(self.init_args.get("moe_num_experts", 0))
        ep = int(self.parallelism.get("expert_par_size", 1))
        if moe_e > 1 or ep > 1:
            assert moe_e > 1, (
                "parallelism.expert_par_size > 1 needs init_args."
                "moe_num_experts > 1 (there are no experts to shard)"
            )
            assert moe_e % ep == 0, (
                f"moe_num_experts {moe_e} must divide by expert_par_size {ep}"
            )
            if pp > 1:
                # MoE x pp composes (round 4): the GPipe schedule keeps ep
                # in GSPMD auto mode and carries the load-balance aux; MoE
                # under pp rides the scan path, which needs moe_every == 1
                assert int(self.init_args.get("moe_every", 2)) == 1, (
                    "MoE with pipe_par_size > 1 runs blocks as one scanned "
                    "stack: set moe_every: 1"
                )
            every = int(self.init_args.get("moe_every", 2))
            assert every >= 1, "moe_every must be >= 1"
            if bool(
                self.trainer.get(
                    "scan_layers", self.init_args.get("scan_layers", False)
                )
            ):
                assert every == 1, (
                    "scan_layers stacks identical blocks: MoE under scan "
                    "requires moe_every == 1"
                )
        sp_mode = str(self.parallelism.get("sp_mode", "auto")).lower()
        assert sp_mode in ("auto", "ulysses", "ring", "gather"), (
            f"parallelism.sp_mode must be auto|ulysses|ring|gather, got {sp_mode}"
        )
        if sp_mode == "ulysses":
            sp = int(self.parallelism.get("seq_par_size", 1))
            assert (heads // tp) % max(sp, 1) == 0, (
                "sp_mode=ulysses needs num_heads/tensor_par_size divisible "
                "by seq_par_size"
            )
            if self.task in ("mae", "diffusion"):
                # the decoder's attention runs under the same sp axis — catch
                # its head count at load time, not mid-run inside shard_map
                dec_heads = int(self.init_args.get("decoder_num_heads", 16))
                assert (dec_heads // tp) % max(sp, 1) == 0, (
                    "sp_mode=ulysses needs decoder_num_heads/tensor_par_size "
                    f"divisible by seq_par_size (got {dec_heads} heads, "
                    f"tp={tp}, sp={sp})"
                )
        # Reference-config compatibility: the reference's MAE-transfer keys
        # (use_pretrained_mae_model + mae_checkpoint_path [+ filename], read
        # at `train_unetr_simple.py`/`train_sap_simple.py:308-330`) map onto
        # trainer.pretrained_mae_checkpoint here. Honor the reference
        # spelling so a migrated config doesn't silently skip the warm start.
        tr = self.raw.setdefault("trainer", {})
        if tr.get("use_pretrained_mae_model") and not tr.get(
            "pretrained_mae_checkpoint"
        ):
            path = str(tr.get("mae_checkpoint_path") or "")
            assert path, (
                "trainer.use_pretrained_mae_model is set but neither "
                "trainer.pretrained_mae_checkpoint nor "
                "trainer.mae_checkpoint_path is"
            )
            fname = str(tr.get("mae_checkpoint_filename") or "")
            assert not fname.endswith(".ckpt"), (
                f"trainer.mae_checkpoint_filename ('{fname}') is a torch "
                "checkpoint; convert it first (tools/convert_checkpoint.py "
                "to-jax) and point trainer.mae_checkpoint_path at the "
                "converted directory"
            )
            tr["pretrained_mae_checkpoint"] = path
            # pin the slot too: the alias must not fall through to the
            # task's own resume slot (checkpoint_filename_for_loading),
            # which names a slot of a DIFFERENT run. "" = newest in dir.
            tr.setdefault("pretrained_mae_filename", fname)


TASK_ALIASES = {
    "classification": "classification",
    "class": "classification",
    "mae": "mae",
    "masked": "mae",
    "unetr": "unetr",
    "sap": "sap",
    "diffusion": "diffusion",
}


def infer_task(path: str, raw: Dict[str, Any]) -> str:
    t = raw.get("trainer", {}).get("task")
    if t:
        return TASK_ALIASES[t]
    for key in TASK_ALIASES:
        if f"/{key}/" in path or f"_{key}" in path or f"{key}_" in path:
            return TASK_ALIASES[key]
    raise ValueError(
        f"cannot infer task from {path}; set trainer.task in the config"
    )


def load_config(path: str, task: Optional[str] = None) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg = Config(raw=raw, task=TASK_ALIASES[task] if task else infer_task(path, raw))
    cfg.validate()
    return cfg
