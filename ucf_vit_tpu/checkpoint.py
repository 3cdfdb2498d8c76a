"""Checkpoint save/load (Orbax) with the reference's robustness scheme.

Capability parity with the reference's per-script torch.save dicts:
- alternating even/odd checkpoint files so a crash mid-save loses at most
  one epoch (`train_masked_fsdp.py:624-644`, `README.md:985`);
- state = {epoch, params, opt_state, loss_scale, loss_list}
  (`train_class_simple.py:372-388`);
- MAE -> UNETR/SAP encoder transfer: drop decoder*/mask_token keys, copy
  matching encoder entries (`inference_unetr_simple.py:274-327`), with 1D
  pos-embed length interpolation for changed fixed_length
  (`utils/misc.py:98-127`, `train_sap_simple.py:308-330`).

Orbax async sharded checkpointing replaces the reference's per-TP-rank
file-per-rank dance (`train_masked_fsdp.py:627-644`): each device writes its
own param shards; resume restores with the current mesh sharding.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ucf_vit_tpu.ops.pos_embed import interpolate_pos_embed_1d


# Optional payload keys and their abstract restore templates. head_meta
# guards head regrouping; data_it/total_steps/rng_key carry mid-epoch
# trainer progress (rng_key is jax.random.key_data of the default threefry
# impl — shape (2,) uint32; the framework never switches PRNG impls).
OPTIONAL_PAYLOAD_KEYS = {
    "head_meta": lambda: np.zeros((2,), np.int64),
    "data_it": lambda: np.asarray(0),
    "total_steps": lambda: np.asarray(0),
    "rng_key": lambda: np.zeros((2,), np.uint32),
    # process count at save time: mid-epoch fast-forward replays per-process
    # file shards, so data_it is only meaningful under the same topology
    "num_procs": lambda: np.asarray(0),
}


def _ckpt_dir(checkpoint_path: str, filename: str, epoch: int) -> str:
    parity = "even" if epoch % 2 == 0 else "odd"
    return os.path.abspath(os.path.join(checkpoint_path, f"{filename}_{parity}"))


_ASYNC_CKPTR = None


def _async_ckptr():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_until_finished():
    """Block until any in-flight async checkpoint save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    checkpoint_path: str,
    filename: str,
    epoch: int,
    state,
    loss_list=None,
    block: bool = True,
    slot_epoch: Optional[int] = None,
    head_meta=None,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Write the even/odd checkpoint for this epoch. Returns the dir.

    block=False starts an async save (device arrays are snapshotted first, so
    training can donate/overwrite them immediately) and returns; the write
    overlaps the next epoch. Crash-robustness contract (the reference's
    even/odd rotation, `README.md:985`): force=True clears the same-parity
    slot in the *blocking* part of the save, so a crash during the async
    write window loses that slot — survivability rests on the OTHER parity
    slot, which always holds the previous committed epoch. A crash therefore
    loses at most one epoch, same as the reference.

    slot_epoch overrides which parity slot is written while `epoch` is still
    what resume reads. The preemption save uses this: it records epoch-1 (so
    the interrupted epoch re-runs) but writes into the current epoch's slot —
    overwriting the OLDEST checkpoint instead of force-deleting the newest
    committed one, which a SIGKILL mid-write would otherwise lose.
    """
    path = _ckpt_dir(
        checkpoint_path, filename, epoch if slot_epoch is None else slot_epoch
    )
    ckptr = _async_ckptr()
    lst = [float(v) for v in (loss_list if loss_list is not None else [])]
    payload = {
        "epoch": np.asarray(epoch),
        "state": state,
        # explicit format version in the key name (the v1 "loss_list" key
        # inferred its length-prefix from data values, which misparses a
        # first-epoch loss that happens to equal len-1); length-prefixed
        # because Orbax rejects zero-size arrays and a preemption save
        # during the first epoch has an empty loss history
        "loss_list_v2": np.asarray([float(len(lst))] + lst),
    }
    if head_meta is not None:
        # [num_heads, decoder_num_heads] — validated on resume (see
        # _check_head_meta: head regrouping keeps shapes, changes the fn)
        payload["head_meta"] = np.asarray([int(v) for v in head_meta])
    for k, v in (extra or {}).items():
        # optional trainer-progress keys (data_it / total_steps / rng_key for
        # mid-epoch resume); restore_checkpoint reconciles their presence
        assert k in OPTIONAL_PAYLOAD_KEYS, f"unknown extra payload key {k!r}"
        payload[k] = np.asarray(v)
    ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
    if block:
        ckptr.wait_until_finished()
    return path


def stored_epoch(path: str) -> int:
    """Read just the 'epoch' scalar from a checkpoint directory — a partial
    restore that never touches the (large) model state."""
    ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    try:
        r = ckptr.restore(
            path, args=ocp.args.PyTreeRestore({"epoch": 0}, partial_restore=True)
        )
        return int(np.asarray(r["epoch"]))
    finally:
        ckptr.close()


def _payload_keys(path: str):
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    try:
        md = ckptr.metadata(path).item_metadata
        return set(md.keys())
    finally:
        ckptr.close()


def _is_ckpt_dir(p: str) -> bool:
    return os.path.isdir(p) and os.path.exists(
        os.path.join(p, "_CHECKPOINT_METADATA")
    )


def resolve_slot(checkpoint_path: str, filename_for_loading: str) -> str:
    """Resolve a checkpoint filename to its on-disk directory. A trailing
    '_latest' picks the even/odd slot with the larger *stored epoch* (mtime
    only breaks ties — robust to clock skew on shared storage).

    An EMPTY filename means "whatever is newest here": checkpoint_path
    itself if it is a checkpoint, else the slot under it with the largest
    stored epoch — the right default when pointing at a foreign run's
    directory (e.g. the reference-spelling MAE-transfer alias, where the
    user names a directory but no slot)."""
    if not filename_for_loading:
        base = os.path.abspath(checkpoint_path)
        if _is_ckpt_dir(base):
            return base
        cands = [
            os.path.join(base, d)
            for d in (os.listdir(base) if os.path.isdir(base) else [])
        ]
        cands = [c for c in cands if _is_ckpt_dir(c)]
        assert cands, f"no checkpoint slots under {checkpoint_path}"
        return max(cands, key=lambda c: (stored_epoch(c), os.path.getmtime(c)))
    if filename_for_loading.endswith("_latest"):
        stem = filename_for_loading[: -len("_latest")]
        candidates = [
            os.path.abspath(os.path.join(checkpoint_path, f"{stem}_{p}"))
            for p in ("even", "odd")
        ]
        candidates = [c for c in candidates if os.path.isdir(c)]
        assert candidates, f"no {stem}_even/_odd checkpoint under {checkpoint_path}"
        filename_for_loading = os.path.basename(
            max(candidates, key=lambda c: (stored_epoch(c), os.path.getmtime(c)))
        )
    resolved = os.path.abspath(os.path.join(checkpoint_path, filename_for_loading))
    if not _is_ckpt_dir(resolved):
        # Catch torch-reference checkpoints BEFORE Orbax fails opaquely. The
        # reference scripts append '.ckpt' themselves
        # (`train_unetr_simple.py:327`), so migrated configs carry
        # extension-less names like 'epoch_350' — the suffix check in
        # config.py cannot see those; the on-disk shape can.
        torch_file = next(
            (
                p
                for p in (resolved, resolved + ".ckpt")
                if os.path.isfile(p)
            ),
            None,
        )
        if torch_file is not None:
            raise ValueError(
                f"{torch_file} is a file, not an Orbax checkpoint directory — "
                "it looks like a torch reference checkpoint. Convert it first:"
                f"\n  python -m ucf_vit_tpu.tools.convert_checkpoint to-jax "
                f"{torch_file} <out_dir>\nand point the config at <out_dir> "
                "(see docs/MIGRATION.md)."
            )
        raise FileNotFoundError(
            f"no checkpoint at {resolved} (missing _CHECKPOINT_METADATA). "
            f"Slots present under {checkpoint_path}: "
            f"{[d for d in os.listdir(checkpoint_path)] if os.path.isdir(checkpoint_path) else 'none (path missing)'}"
        )
    return resolved


def state_has_key(checkpoint_path: str, filename_for_loading: str, key: str) -> bool:
    """Whether the on-disk checkpoint's `state` subtree contains `key`
    (e.g. 'ema_params') — lets callers reconcile config-toggled state
    fields with older checkpoints before a strict Orbax restore."""
    wait_until_finished()
    path = resolve_slot(checkpoint_path, filename_for_loading)
    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    try:
        md = ckptr.metadata(path).item_metadata
        state_md = md["state"] if "state" in md.keys() else {}
        # a TrainState field that was None at save time is recorded as an
        # explicit None in the metadata tree — that's "absent" for callers
        return key in state_md and state_md[key] is not None
    finally:
        ckptr.close()


def restore_checkpoint(
    checkpoint_path: str,
    filename_for_loading: str,
    abstract_payload=None,
    expect_head_meta=None,
):
    """Restore from <checkpoint_path>/<filename_for_loading> (the reference
    passes e.g. 'multi_last_odd' explicitly, `configs/.../base_config.yaml`).
    abstract_payload (same pytree of jax.ShapeDtypeStruct with shardings)
    restores directly onto the mesh.

    filename_for_loading may end in '_latest' (e.g. 'multi_last_latest'):
    the slot whose *stored epoch* is larger is chosen — the epoch recorded
    inside the payload is authoritative, unlike directory mtime which is
    fragile across filesystems/clock skew on shared storage. mtime only
    breaks ties (a preemption save can legitimately record the same epoch
    in both slots).

    Checkpoints written before the 'loss_list_v2' key rename are restored
    transparently (the abstract payload's loss key is remapped to whatever
    the on-disk checkpoint actually contains)."""
    wait_until_finished()  # an async save to a slot may still be in flight
    path = resolve_slot(checkpoint_path, filename_for_loading)
    ckptr = ocp.StandardCheckpointer()
    if abstract_payload is None:
        payload = ckptr.restore(path)
        _check_head_meta(payload, expect_head_meta)
        return payload
    on_disk_keys = _payload_keys(path)
    # remap the loss-list key to match the on-disk format version
    loss_keys = {"loss_list", "loss_list_v2"}
    want = loss_keys & set(abstract_payload)
    if want:
        on_disk = on_disk_keys & loss_keys
        if on_disk and on_disk != want:
            abstract_payload = dict(abstract_payload)
            abstract_payload[on_disk.pop()] = abstract_payload.pop(want.pop())
    # Optional keys (head_meta, mid-epoch progress) appear in checkpoints
    # written after the feature that added them; Orbax is strict about the
    # abstract tree matching the on-disk tree, so reconcile both ways:
    # inject keys the checkpoint carries, drop requested keys it predates.
    for key, template in OPTIONAL_PAYLOAD_KEYS.items():
        if key in on_disk_keys and key not in abstract_payload:
            abstract_payload = dict(abstract_payload)
            abstract_payload[key] = template()
        elif key not in on_disk_keys and key in abstract_payload:
            abstract_payload = dict(abstract_payload)
            del abstract_payload[key]
    payload = ckptr.restore(path, abstract_payload)
    _check_head_meta(payload, expect_head_meta)
    return payload


def head_meta_from_config(cfg) -> tuple:
    """Effective [num_heads, decoder_num_heads] the built model runs with.

    Mirrors tasks.py's build defaults (num_heads 12; decoder_num_heads 16
    for the two decoder-bearing tasks), so an omitted key and its explicit
    default stamp identically. Decoder-less tasks stamp 0."""
    dec = (
        int(cfg.init_args.get("decoder_num_heads", 16))
        if cfg.task in ("mae", "diffusion")
        else 0
    )
    return (int(cfg.init_args.get("num_heads", 12)), dec)


def _check_head_meta(payload, expect) -> None:
    """Refuse to resume under a different attention-head grouping.

    All head counts at a fixed embed_dim produce IDENTICAL parameter shapes
    (qkv/proj are [D, 3D]/[D, D] however heads split D), so a checkpoint
    trained at one grouping restores cleanly under another while silently
    computing a different function — the restored weights are effectively
    scrambled w.r.t. the new head partition. This bit in round 3 when the
    shipped MAE decoder relayout changed decoder_num_heads 16 -> 4.

    A None entry in `expect` skips that position — the MAE->UNETR/SAP
    transfer path checks only the encoder heads (the decoder is stripped)."""
    if expect is None or "head_meta" not in payload:
        return
    got = [int(v) for v in np.asarray(payload["head_meta"])]
    want = [None if v is None else int(v) for v in expect]
    if any(w is not None and g != w for g, w in zip(got, want)):
        raise ValueError(
            f"checkpoint was trained with [num_heads, decoder_num_heads] = "
            f"{got} but the config now says {want}. Head regrouping keeps "
            f"parameter shapes but changes the function (attention splits "
            f"the embed dim differently), so resuming would silently "
            f"corrupt training. Restore with the original head counts, or "
            f"start a fresh run for the new layout."
        )


def loss_list_from_payload(payload) -> list:
    """Decode the per-epoch loss history from a restored payload, handling
    both the current 'loss_list_v2' key (length prefix trusted) and the
    legacy 'loss_list' key (prefix inferred from data values)."""
    if "loss_list_v2" in payload:
        arr = np.asarray(payload["loss_list_v2"])
        if arr.size == 0:
            return []
        return [float(v) for v in arr[1 : 1 + int(arr[0])]]
    return decode_loss_list(payload.get("loss_list", np.zeros((0,))))


def decode_loss_list(arr) -> list:
    """Inverse of the legacy (v1) length-prefixed loss_list encoding.
    Arrays whose first element is not a consistent length prefix are treated
    as the pre-prefix format (a plain list of epoch losses)."""
    arr = np.asarray(arr)
    if arr.size == 0:
        return []
    if float(arr[0]) == float(arr.size - 1):
        return [float(v) for v in arr[1:]]
    return [float(v) for v in arr]


# ---------------------------------------------------------------------------
# MAE -> UNETR / SAP encoder transfer
# ---------------------------------------------------------------------------

_DROP_PREFIXES = ("decoder_", "mask_token")


def transfer_mae_encoder(
    mae_params: Dict[str, Any],
    target_params: Dict[str, Any],
    new_pos_embed_len: Optional[int] = None,
) -> Dict[str, Any]:
    """Initialize a UNETR/SAP param tree from an MAE checkpoint.

    Drops MAE decoder keys, copies every remaining entry whose path exists
    in the target with a matching shape; optionally 1D-interpolates
    pos_embed tables to a new token count (adaptive fixed_length change).
    Returns a new target param tree.
    """
    import copy

    out = copy.deepcopy(jax.tree.map(lambda x: x, target_params))

    def walk(src: Dict[str, Any], dst: Dict[str, Any], prefix: str = ""):
        for k, v in src.items():
            if any(k.startswith(p) for p in _DROP_PREFIXES):
                continue
            if k not in dst:
                continue
            if isinstance(v, dict) and isinstance(dst[k], dict):
                walk(v, dst[k], prefix + k + "/")
            else:
                sv = np.asarray(v)
                dv = dst[k]
                if "pos_embed" in k and new_pos_embed_len is not None:
                    if sv.ndim == 3 and sv.shape[1] != np.shape(dv)[1]:
                        sv = interpolate_pos_embed_1d(sv, np.shape(dv)[1])
                if np.shape(dv) == sv.shape:
                    dst[k] = sv.astype(np.asarray(dv).dtype)

    walk(mae_params, out)
    return out


def relayout_stacked(src: Dict[str, Any], target: Dict[str, Any]) -> Dict[str, Any]:
    """Adapt a loaded params tree to the target's block-stack layout.

    The encoder stack ('blocks') and the MAE/DiffusionVIT decoder stack
    ('decoder_blocks') have two on-disk layouts: per-layer subtrees
    `<name>_{i}` (plain module lists) and a scan-stacked `{name: {block:
    ...}}` container with a leading depth axis (scan_layers, and always
    under pipe_par_size > 1). Checkpoints written in one layout can warm-
    start or elastically resume a model built in the other: this stacks or
    unstacks each family to match `target`. Entries already in the target
    layout pass through untouched.
    """
    def per_layer_keys(tree, name):
        ks = [k for k in tree if re.fullmatch(rf"{name}_\d+", k)]
        return sorted(ks, key=lambda k: int(k.rsplit("_", 1)[1]))

    def stack(trees):
        if isinstance(trees[0], dict):
            return {k: stack([t[k] for t in trees]) for k in trees[0]}
        return np.stack([np.asarray(t) for t in trees])

    def unstack(tree, i):
        if isinstance(tree, dict):
            return {k: unstack(v, i) for k, v in tree.items()}
        return np.asarray(tree)[i]

    out = dict(src)
    for name in ("blocks", "decoder_blocks"):
        tgt_stacked = isinstance(target.get(name), dict) and set(
            target[name]
        ) == {"block"}
        src_layers = per_layer_keys(src, name)
        src_stacked = isinstance(src.get(name), dict) and set(
            src[name]
        ) == {"block"}
        if tgt_stacked and src_layers:
            out[name] = {"block": stack([src[k] for k in src_layers])}
            for k in src_layers:
                del out[k]
        elif not tgt_stacked and src_stacked and per_layer_keys(target, name):
            depth = len(per_layer_keys(target, name))
            src_depth = int(
                np.shape(jax.tree.leaves(src[name]["block"])[0])[0]
            )
            # depth mismatch must fail loudly in BOTH directions: the stack
            # branch trips the downstream shape assert, but unstacking a
            # deeper checkpoint would silently discard its tail layers
            assert src_depth == depth, (
                f"checkpoint '{name}' stack has depth {src_depth} but the "
                f"model has {depth} layers — refusing to silently "
                f"truncate/short-fill a warm start"
            )
            for i in range(depth):
                out[f"{name}_{i}"] = unstack(src[name]["block"], i)
            del out[name]
    return out
