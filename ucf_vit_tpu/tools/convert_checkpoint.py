"""Bidirectional checkpoint conversion between the reference (PyTorch
UCF-VIT, `torch.save` dicts — `train_class_simple.py:372-388`) and this
framework's Orbax checkpoints.

The interop story for a reference user switching frameworks: convert an
existing reference checkpoint (e.g. an ORBIT MAE pretrain) with `to-jax`,
then either resume/fine-tune via `trainer.init_params_from`, or feed it to
the existing MAE->UNETR/SAP transfer path (`trainer.pretrained_mae_checkpoint`
— the reference pattern at `inference_unetr_simple.py:274-327`). `to-torch`
goes the other way so results trained here can be evaluated with reference
tooling.

Name mapping (flax param tree path -> torch state_dict key) and the layout
transforms are the same correspondences proven by the true-reference parity
tests (`tests/test_reference_parity.py`, outputs matched to 1e-3):

  flax                                torch                      transform
  ----------------------------------  -------------------------  ---------
  blocks_3/attn/qkv/kernel            blocks.3.attn.qkv.weight   transpose
  norm/scale                          norm.weight                identity
  token_embed/proj/kernel (conv)      token_embeds.proj.weight   [*k,i,o]->[o,i,*k]
  token_embed/{norm_in,proj,norm_out} token_embeds.{0,1,2}       (adaptive LN-Linear-LN)
  neck/kernel (ConvTranspose)         neck.0.weight              [*k,i,o]->[i,o,*k] + spatial flip
  encoder2/up_0/kernel                encoder2.blocks.0.0.weight convT
  encoder2/res_0/conv1/kernel         encoder2.blocks.0.1.conv1.weight
  time_embedding_map/linear1/kernel   timeEmbeddingMap.linear1.weight
  adaptive_pos_dep_emb/linear/kernel  adaptive_pos_dep_emb.0.weight

The spatial flip on ConvTranspose kernels: `lax.conv_transpose` does not
mirror the kernel, torch's gradient-of-conv formulation does.

MONAI wrapping: real MONAI conv blocks nest the conv inside a Convolution
module (state keys like `encoder1.layer.conv1.conv.weight`); import tries
that spelling as a fallback for every conv/convT leaf. MONAI instance norms
are non-affine by default — affine norm keys, if present, are reported as
unused (lenient) or an error (strict).

CLI:
  python -m ucf_vit_tpu.tools.convert_checkpoint to-jax  <ref.ckpt> <config.yaml> <out_dir> [--filename NAME] [--lenient]
  python -m ucf_vit_tpu.tools.convert_checkpoint to-torch <ckpt_path> <ckpt_filename> <config.yaml> <out.ckpt>
"""

from __future__ import annotations

import re
import sys
from typing import Any, Dict, List, Tuple

import numpy as np

# Modules whose `kernel` is a ConvTranspose ([*k, in, out] in flax,
# [in, out, *k] + implicit mirror in torch).
_CONVT_PARENT_RE = re.compile(r"neck|transp_conv|transp_conv_init|up_\d+")

# flax adaptive LinearTokenEmbed children -> indices in the reference's
# nn.Sequential(LayerNorm, Linear, LayerNorm) (`simple/arch.py:286-290`)
_LTE_CHILD = {"norm_in": "0", "proj": "1", "norm_out": "2"}

# flax Sequential-of-one modules -> ".0" in torch
_SEQ0_PARENTS = {"adaptive_pos_dep_emb", "decoder_adaptive_pos_dep_emb"}


def _seg(name: str, parent: str, subtree) -> str:
    """Translate one flax path segment to its torch spelling."""
    m = re.fullmatch(r"(decoder_blocks|blocks)_(\d+)", name)
    if m:
        return f"{m.group(1)}.{m.group(2)}"
    m = re.fullmatch(r"token_embed(?:_(\d+))?", name)
    if m:
        return "token_embeds" + (f".{m.group(1)}" if m.group(1) else "")
    m = re.fullmatch(r"up_(\d+)", name)
    if m:
        return f"blocks.{m.group(1)}.0"
    m = re.fullmatch(r"res_(\d+)", name)
    if m:
        return f"blocks.{m.group(1)}.1"
    if name == "time_embedding_map":
        return "timeEmbeddingMap"
    if name == "linear" and parent in _SEQ0_PARENTS:
        return "0"
    if name in ("neck", "mask_header"):
        return f"{name}.0"  # nn.Sequential of one conv (`simple/arch.py:499-519`)
    if name == "block":
        return ""  # nn.scan body wrapper; no torch counterpart
    return name


def _leaf_transform(fpath: Tuple[str, ...], rank: int) -> Tuple[str, str]:
    """-> (torch leaf name, transform tag) for a flax leaf."""
    name = fpath[-1]
    if name == "scale":
        return "weight", "identity"  # LayerNorm
    if name == "bias":
        return "bias", "identity"
    if name == "kernel":
        parent = fpath[-2] if len(fpath) > 1 else ""
        if _CONVT_PARENT_RE.fullmatch(parent):
            return "weight", "convt"
        if rank > 2:
            return "weight", "conv"
        return "weight", "linear"
    return name, "identity"  # pos_embed / cls_token / mask_token / gamma / ...


def _to_flax(arr: np.ndarray, tag: str) -> np.ndarray:
    if tag == "identity":
        return arr
    if tag == "linear":
        return arr.T
    nd = arr.ndim - 2
    if tag == "conv":  # torch [out, in, *k] -> flax [*k, in, out]
        return arr.transpose(*range(2, arr.ndim), 1, 0)
    if tag == "convt":  # torch [in, out, *k] -> flax [*k, in, out] + flip
        k = arr.transpose(*range(2, arr.ndim), 0, 1)
        return k[(slice(None, None, -1),) * nd]
    raise ValueError(tag)


def _to_torch(arr: np.ndarray, tag: str) -> np.ndarray:
    if tag == "identity":
        return arr
    if tag == "linear":
        return np.ascontiguousarray(arr.T)
    nd = arr.ndim - 2
    if tag == "conv":  # flax [*k, in, out] -> torch [out, in, *k]
        return np.ascontiguousarray(arr.transpose(nd + 1, nd, *range(nd)))
    if tag == "convt":  # flax [*k, in, out] -> torch [in, out, *k] + flip
        k = arr[(slice(None, None, -1),) * nd]
        return np.ascontiguousarray(k.transpose(nd, nd + 1, *range(nd)))
    raise ValueError(tag)


def _iter_leaves(tree: Dict[str, Any], fpath=(), tpath=()):
    """Yield (flax_path, torch_key_prefix_parts, leaf) over a param tree,
    applying all context-dependent segment renames."""
    is_lte = isinstance(tree, dict) and "norm_in" in tree
    for k in sorted(tree):
        v = tree[k]
        parent = fpath[-1] if fpath else ""
        seg = _LTE_CHILD[k] if (is_lte and k in _LTE_CHILD) else _seg(k, parent, v)
        segs = tpath + ((seg,) if seg else ())
        if isinstance(v, dict):
            yield from _iter_leaves(v, fpath + (k,), segs)
        else:
            yield fpath + (k,), segs, v


def _unbox(tree):
    """Strip flax Partitioned/AxisMetadata boxes (GSPMD logical-axis
    annotations) — conversion operates on plain arrays."""
    from flax import linen as fnn

    return fnn.meta.unbox(tree)


def _shape_dtype(leaf):
    return tuple(leaf.shape), getattr(leaf, "dtype", np.float32)


def _is_scan_blocks(tree) -> bool:
    return isinstance(tree, dict) and set(tree) == {"block"}


def _unstack_scan(template: Dict[str, Any]) -> Tuple[Dict[str, Any], int]:
    """Replace a scan-layers `blocks` container (stacked leaves, leading
    depth dim) with per-layer `blocks_{i}` subtrees of sliced shapes."""
    blocks = template["blocks"]["block"]
    leaves = [l for _, _, l in _iter_leaves(blocks)]
    depth = int(leaves[0].shape[0])

    def slice_tree(t, i):
        if isinstance(t, dict):
            return {k: slice_tree(v, i) for k, v in t.items()}
        import jax

        if isinstance(t, jax.ShapeDtypeStruct):
            return jax.ShapeDtypeStruct(tuple(t.shape[1:]), t.dtype)
        # materialized template: keep layer i's real init values so lenient
        # import can fall back to them
        return np.asarray(t)[i]

    out = {k: v for k, v in template.items() if k != "blocks"}
    for i in range(depth):
        out[f"blocks_{i}"] = slice_tree(blocks, i)
    return out, depth


def _restack_scan(params: Dict[str, Any], depth: int) -> Dict[str, Any]:
    def stack(trees):
        if isinstance(trees[0], dict):
            return {k: stack([t[k] for t in trees]) for k in trees[0]}
        return np.stack(trees)

    out = {k: v for k, v in params.items() if not re.fullmatch(r"blocks_\d+", k)}
    out["blocks"] = {"block": stack([params[f"blocks_{i}"] for i in range(depth)])}
    return out


def import_torch_state(
    state_dict: Dict[str, Any],
    params_template: Dict[str, Any],
    strict: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, List[str]]]:
    """Convert a reference torch state_dict into this framework's param tree.

    params_template is a pytree of arrays or ShapeDtypeStructs giving the
    target structure (e.g. `jax.eval_shape` of the model init). Returns
    (params, report) where report lists 'missing' flax paths (lenient mode
    keeps the template value, which must then be a real array) and 'unused'
    torch keys. strict=True raises on either.
    """
    params_template = _unbox(params_template)
    sd: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        if k.startswith("module."):  # DDP wrapping (`train_class_simple.py:230`)
            k = k[len("module.") :]
        if k.startswith("patch_embed."):
            # the reference registers the same PatchEmbed module under both
            # `patch_embed` and `token_embeds` (`simple/arch.py:294-299`);
            # the state_dict carries the tensors twice — keep one spelling
            continue
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = np.asarray(v)

    scan_depth = None
    if "blocks" in params_template and _is_scan_blocks(params_template["blocks"]):
        params_template, scan_depth = _unstack_scan(dict(params_template))

    used, missing = set(), []
    out: Dict[str, Any] = {}

    def set_path(tree, fpath, val):
        for p in fpath[:-1]:
            tree = tree.setdefault(p, {})
        tree[fpath[-1]] = val

    for fpath, tsegs, leaf in _iter_leaves(params_template):
        shape, dtype = _shape_dtype(leaf)
        # torch rank for transform decisions == flax rank
        tleaf, tag = _leaf_transform(fpath, len(shape))
        key = ".".join(tsegs[:-1] + (tleaf,))
        # real-MONAI Convolution wrapping: ...conv1.conv.{weight,bias}
        candidates = [key, ".".join(tsegs[:-1] + ("conv", tleaf))]
        src = next((c for c in candidates if c in sd), None)
        if src is None:
            missing.append("/".join(fpath) + f"  (tried {candidates})")
            if not strict:
                import jax

                if isinstance(leaf, jax.ShapeDtypeStruct):
                    raise ValueError(
                        f"lenient import needs a real init value for missing "
                        f"leaf {'/'.join(fpath)}, but the template is "
                        f"abstract — build it with materialize=True"
                    )
                set_path(out, fpath, np.asarray(leaf))
            continue
        used.add(src)
        val = _to_flax(sd[src], tag)
        if tuple(val.shape) != shape:
            raise ValueError(
                f"shape mismatch for {'/'.join(fpath)} <- {src}: "
                f"torch-side {val.shape} (after {tag}) vs model {shape}"
            )
        set_path(out, fpath, val.astype(dtype))

    unused = sorted(set(sd) - used)
    report = {"missing": missing, "unused": unused}
    if strict and (missing or unused):
        raise ValueError(
            "conversion mismatch (pass strict=False / --lenient to proceed):\n"
            + "\n".join(
                [f"  missing: {m}" for m in missing]
                + [f"  unused torch key: {u}" for u in unused]
            )
        )
    if scan_depth is not None:
        out = _restack_scan(out, scan_depth)
    return out, report


def export_torch_state(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Convert this framework's param tree into a reference-layout torch
    state_dict (values are numpy arrays; `torch.save`-able as-is, and
    `torch.from_numpy`-loadable into the reference modules)."""
    p = _unbox(params)
    if "blocks" in p and _is_scan_blocks(p["blocks"]):
        blocks = p["blocks"]["block"]
        depth = int(next(l for _, _, l in _iter_leaves(blocks)).shape[0])

        def take(t, i):
            if isinstance(t, dict):
                return {k: take(v, i) for k, v in t.items()}
            return np.asarray(t)[i]

        p = {k: v for k, v in p.items() if k != "blocks"}
        for i in range(depth):
            p[f"blocks_{i}"] = take(blocks, i)

    out: Dict[str, np.ndarray] = {}
    for fpath, tsegs, leaf in _iter_leaves(p):
        arr = np.asarray(leaf)
        tleaf, tag = _leaf_transform(fpath, arr.ndim)
        out[".".join(tsegs[:-1] + (tleaf,))] = _to_torch(arr, tag)
    return out


# ---------------------------------------------------------------------------
# config-driven template + CLI
# ---------------------------------------------------------------------------


def params_template_from_config(cfg, materialize: bool = False):
    """Param tree template for the config's model. materialize=False gives
    abstract ShapeDtypeStructs (`jax.eval_shape` — no device computation);
    materialize=True runs the real initializers, so lenient conversion keeps
    proper fresh-init values (not zeros) for layers the source lacks, e.g. a
    new classification head on a converted MAE encoder."""
    import jax

    from ucf_vit_tpu.tasks import build_task
    from ucf_vit_tpu.train import _init_variables, example_batch

    model, _ = build_task(cfg)
    ex = example_batch(cfg, 2)
    var_ids = (
        model.get_var_ids(ex["variables"])
        if cfg.init_args.get("use_varemb", False)
        else None
    )

    def init_fn():
        rngs = {
            "params": jax.random.key(0),
            "mask": jax.random.key(1),
            "dropout": jax.random.key(2),
        }
        return _init_variables(model, rngs, cfg, ex, var_ids)

    if materialize:
        return jax.device_get(jax.jit(init_fn)())["params"], model
    return jax.eval_shape(init_fn)["params"], model


def _head_meta(cfg):
    from ucf_vit_tpu.checkpoint import head_meta_from_config

    return head_meta_from_config(cfg)


def to_jax(argv: List[str]) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="convert_checkpoint to-jax")
    ap.add_argument("torch_ckpt")
    ap.add_argument("config")
    ap.add_argument("out_dir")
    ap.add_argument("--filename", default="converted")
    ap.add_argument("--lenient", action="store_true")
    args = ap.parse_args(argv)

    import torch

    from ucf_vit_tpu import checkpoint as ckpt
    from ucf_vit_tpu.config import load_config

    try:
        payload = torch.load(args.torch_ckpt, map_location="cpu", weights_only=True)
    except Exception:
        payload = torch.load(args.torch_ckpt, map_location="cpu")
    sd = payload.get("model_state_dict", payload) if isinstance(payload, dict) else payload
    epoch = int(payload.get("epoch", 0)) if isinstance(payload, dict) else 0
    losses = payload.get("loss_list", []) if isinstance(payload, dict) else []
    losses = [float(np.asarray(v)) for v in losses]

    cfg = load_config(args.config)
    template, _ = params_template_from_config(cfg, materialize=args.lenient)
    params, report = import_torch_state(sd, template, strict=not args.lenient)
    if report["missing"] or report["unused"]:
        for m in report["missing"]:
            print(f"missing (kept init): {m}")
        for u in report["unused"]:
            print(f"unused torch key: {u}")
    path = ckpt.save_checkpoint(
        args.out_dir, args.filename, epoch, {"params": params},
        loss_list=losses, head_meta=_head_meta(cfg),
    )
    n = sum(int(np.prod(np.shape(l))) for _, _, l in _iter_leaves(params))
    print(f"wrote {path} ({n/1e6:.1f}M params, epoch {epoch})")
    print(
        "use via trainer.init_params_from (resume/fine-tune) or "
        "trainer.pretrained_mae_checkpoint (MAE->UNETR/SAP transfer)"
    )
    return 0


def to_torch(argv: List[str]) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="convert_checkpoint to-torch")
    ap.add_argument("ckpt_path")
    ap.add_argument("ckpt_filename", help="e.g. imagenet_class_latest")
    ap.add_argument("config")
    ap.add_argument("out_ckpt")
    args = ap.parse_args(argv)

    import torch

    from ucf_vit_tpu import checkpoint as ckpt
    from ucf_vit_tpu.config import load_config

    load_config(args.config)  # validates the config describes this run
    payload = ckpt.restore_checkpoint(args.ckpt_path, args.ckpt_filename)
    params = payload["state"]["params"]
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in export_torch_state(params).items()}
    out = {
        "epoch": int(np.asarray(payload["epoch"])),
        "model_state_dict": sd,
        "loss_list": ckpt.loss_list_from_payload(payload),
    }
    torch.save(out, args.out_ckpt)
    print(f"wrote {args.out_ckpt} ({len(sd)} tensors, epoch {out['epoch']})")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("to-jax", "to-torch"):
        print(__doc__)
        return 2
    return {"to-jax": to_jax, "to-torch": to_torch}[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
