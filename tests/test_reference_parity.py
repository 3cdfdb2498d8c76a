"""TRUE reference parity: our flax models vs the ACTUAL reference modules
(`/root/reference/src/UCF_VIT/simple/arch.py`), run on CPU with vendored
timm shims (`_reference_shims.py`), weights transplanted, outputs matched
to 1e-3 (the BASELINE.json north-star sentence, as a test).

Covers all five architectures: VIT classification, the MAE encoder+decoder
(the flagship path), MAE random_masking exactness given identical noise,
SAP's sqrt-len adaptive path (conv embed + AdaptivePosMLP + ConvTranspose
neck), UNETR's skip-connection and no-skip conv decoders (the MONAI blocks
the reference imports are shimmed in torch from their documented semantics,
so the reference's *wiring* — skip-index selection, proj_feat ordering,
decoder chaining, upsample placement — runs as the oracle), DiffusionVIT
(time-embedding + transformer decoder; the reference's `_pos_embed(x)`
arity bug, `simple/arch.py:1261`, is worked around with an instance-level
shim so its evident intent runs), and the variable-aggregation
cross-attention (`VariableMapping_Attention`)."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

if not os.path.isdir("/root/reference/src/UCF_VIT"):
    pytest.skip("reference checkout not available", allow_module_level=True)

from tests._reference_shims import import_reference_arch

from ucf_vit_tpu.models import MAE, SAP, UNETR, VIT
from ucf_vit_tpu.ops.attention import AttnImpl

ref_arch = import_reference_arch()


def _np(t):
    return np.asarray(t.unbox() if hasattr(t, "unbox") else t)


def _copy_ln(tm, p):
    tm.weight.data.copy_(torch.from_numpy(_np(p["scale"])))
    tm.bias.data.copy_(torch.from_numpy(_np(p["bias"])))


def _copy_linear(tm, p):
    tm.weight.data.copy_(torch.from_numpy(_np(p["kernel"]).T))
    if tm.bias is not None and "bias" in p:
        tm.bias.data.copy_(torch.from_numpy(_np(p["bias"])))


def _copy_block(tb, p):
    _copy_ln(tb.norm1, p["norm1"])
    _copy_linear(tb.attn.qkv, p["attn"]["qkv"])
    _copy_linear(tb.attn.proj, p["attn"]["proj"])
    _copy_ln(tb.norm2, p["norm2"])
    _copy_linear(tb.mlp.fc1, p["mlp"]["fc1"])
    _copy_linear(tb.mlp.fc2, p["mlp"]["fc2"])


def _copy_vit_trunk(tm, params, depth):
    # conv patch embed: flax [kh, kw, in, out] -> torch [out, in, kh, kw]
    k = _np(params["token_embed"]["proj"]["kernel"]).transpose(3, 2, 0, 1)
    tm.token_embeds.proj.weight.data.copy_(torch.from_numpy(k))
    tm.token_embeds.proj.bias.data.copy_(
        torch.from_numpy(_np(params["token_embed"]["proj"]["bias"]))
    )
    if tm.pos_embed is not None:
        tm.pos_embed.data.copy_(torch.from_numpy(_np(params["pos_embed"])))
    if tm.cls_token is not None:
        tm.cls_token.data.copy_(torch.from_numpy(_np(params["cls_token"])))
    for i in range(depth):
        _copy_block(tm.blocks[i], params[f"blocks_{i}"])
    _copy_ln(tm.norm, params["norm"])


CFG = dict(img_size=(32, 32), patch_size=8, in_chans=3, embed_dim=32,
           depth=2, num_heads=4)


def test_vit_classification_matches_reference():
    model = VIT(
        num_classes=5, class_token=True, default_vars=("r", "g", "b"),
        attn_impl=AttnImpl.EINSUM, gelu_approx=False, **CFG,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]

    tm = ref_arch.VIT(
        num_classes=5, class_token=True,
        default_vars=["r", "g", "b"], **CFG,
    )
    tm.eval()
    with torch.no_grad():
        _copy_vit_trunk(tm, params, CFG["depth"])
        _copy_linear(tm.head, params["head"])
        want = tm(torch.from_numpy(x), ("r", "g", "b")).numpy()

    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def _mae_pair(mask_ratio):
    model = MAE(
        class_token=False, default_vars=("r", "g", "b"),
        mask_ratio=mask_ratio, decoder_embed_dim=16, decoder_depth=1,
        decoder_num_heads=4, mlp_ratio_decoder=4.0,
        attn_impl=AttnImpl.EINSUM, gelu_approx=False, **CFG,
    )
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    params = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        jnp.asarray(x),
    )["params"]

    # weight_init='skip' as in the reference's own README MAE example
    # (`README.md:580`): VIT.__init__ otherwise calls the overridden
    # init_weights before the decoder exists (latent reference quirk)
    tm = ref_arch.MAE(
        class_token=False, default_vars=["r", "g", "b"],
        mask_ratio=mask_ratio, linear_decoder=False, decoder_embed_dim=16,
        decoder_depth=1, decoder_num_heads=4, mlp_ratio_decoder=4.0,
        weight_init="skip", **CFG,
    )
    tm.eval()
    with torch.no_grad():
        _copy_vit_trunk(tm, params, CFG["depth"])
        tm.mask_token.data.copy_(torch.from_numpy(_np(params["mask_token"])))
        _copy_linear(tm.decoder_embed, params["decoder_embed"])
        tm.decoder_pos_embed.data.copy_(
            torch.from_numpy(_np(params["decoder_pos_embed"]))
        )
        _copy_block(tm.decoder_blocks[0], params["decoder_blocks_0"])
        _copy_ln(tm.decoder_norm, params["decoder_norm"])
        _copy_linear(tm.decoder_pred, params["decoder_pred"])
    return model, params, tm, x


def test_mae_matches_reference_unmasked():
    """mask_ratio=0: the masking permutation cancels (encoder is
    permutation-equivariant, decoder un-shuffles), so full MAE
    encoder+decoder outputs must match the reference deterministically."""
    model, params, tm, x = _mae_pair(mask_ratio=0.0)
    with torch.no_grad():
        want_pred, want_mask = tm(torch.from_numpy(x), ("r", "g", "b"))
    got_pred, got_mask = model.apply(
        {"params": params}, jnp.asarray(x), rngs={"mask": jax.random.key(2)}
    )
    np.testing.assert_allclose(
        np.asarray(got_pred), want_pred.numpy(), atol=1e-3, rtol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask.numpy())


def test_mae_random_masking_matches_reference_given_noise():
    """Identical noise -> identical keep-set, mask, and restore indices
    (reference `random_masking`, simple/arch.py:663-682)."""
    model, params, tm, x = _mae_pair(mask_ratio=0.75)
    rng = np.random.default_rng(3)
    tokens = rng.normal(size=(2, 16, 32)).astype(np.float32)
    noise = rng.random((2, 16)).astype(np.float32)

    with torch.no_grad():
        want_kept, want_mask, want_restore = tm.random_masking(
            torch.from_numpy(tokens), noise=torch.from_numpy(noise)
        )

    bound = model.bind({"params": params}, rngs={"mask": jax.random.key(0)})
    got_kept, got_mask, got_restore = bound.random_masking(
        jnp.asarray(tokens), noise=jnp.asarray(noise)
    )
    np.testing.assert_allclose(
        np.asarray(got_kept), want_kept.numpy(), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(got_mask), want_mask.numpy())
    np.testing.assert_array_equal(
        np.asarray(got_restore), want_restore.numpy()
    )


def _sap_pair(sqrt_len=4, p=8, num_classes=3, depth=2):
    """SAP sqrt-len transplant pair: (model, params, tm, x, seq_ps).
    Shared by the forward-parity test and the training-curve test."""
    side = sqrt_len * p
    kw = dict(
        img_size=(side, side), patch_size=p, in_chans=1, embed_dim=32,
        depth=depth, num_heads=4, class_token=False,
        adaptive_patching=True, use_adaptive_pos_emb=True,
    )
    model = SAP(
        num_classes=num_classes, default_vars=("ct",),
        fixed_length=sqrt_len**2, sqrt_len_method=True,
        attn_impl=AttnImpl.EINSUM, gelu_approx=False, **kw,
    )
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 1, side, side)).astype(np.float32)
    seq_ps = rng.normal(size=(2, sqrt_len**2, 3)).astype(np.float32)
    params = model.init(
        jax.random.key(0), jnp.asarray(x), None, jnp.asarray(seq_ps)
    )["params"]

    tm = ref_arch.SAP(
        num_classes=num_classes, default_vars=["ct"],
        fixed_length=sqrt_len**2, sqrt_len=sqrt_len, sqrt_len_method=True,
        **kw,
    )
    tm.eval()
    with torch.no_grad():
        k = _np(params["token_embed"]["proj"]["kernel"]).transpose(3, 2, 0, 1)
        tm.token_embeds.proj.weight.data.copy_(torch.from_numpy(k.copy()))
        tm.token_embeds.proj.bias.data.copy_(
            torch.from_numpy(_np(params["token_embed"]["proj"]["bias"]))
        )
        _copy_linear(
            tm.adaptive_pos_dep_emb[0],
            params["adaptive_pos_dep_emb"]["linear"],
        )
        for i in range(kw["depth"]):
            _copy_block(tm.blocks[i], params[f"blocks_{i}"])
        _copy_ln(tm.norm, params["norm"])
        # neck ConvTranspose: flax [kh, kw, in, out] -> torch [in, out, kh, kw]
        # with spatial flip (lax.conv_transpose does not mirror the kernel,
        # torch's gradient-of-conv formulation does)
        nk = _np(params["neck"]["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1)
        tm.neck[0].weight.data.copy_(torch.from_numpy(nk.copy()))
        # 1x1 mask head conv: flax [1, 1, in, out] -> torch [out, in, 1, 1]
        mk = _np(params["mask_header"]["kernel"]).transpose(3, 2, 0, 1)
        tm.mask_header[0].weight.data.copy_(torch.from_numpy(mk.copy()))
        tm.mask_header[0].bias.data.copy_(
            torch.from_numpy(_np(params["mask_header"]["bias"]))
        )
    return model, params, tm, x, seq_ps


def test_sap_adaptive_matches_reference():
    """SAP sqrt-len path vs the actual reference module: conv patch embed on
    the reassembled pseudo-image, AdaptivePosMLP positional embedding,
    ConvTranspose neck + 1x1 mask head (`simple/arch.py:491-536`)."""
    model, params, tm, x, seq_ps = _sap_pair()
    with torch.no_grad():
        want = tm(
            torch.from_numpy(x), ("ct",), seq_ps=torch.from_numpy(seq_ps)
        ).numpy()

    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), None, jnp.asarray(seq_ps))
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# UNETR (skip + no-skip conv decoders) vs the actual reference module
# ---------------------------------------------------------------------------


def _copy_conv(tconv, p, ndim):
    """flax conv kernel [*k, in, out] -> torch [out, in, *k]."""
    k = _np(p["kernel"])
    perm = (ndim + 1, ndim) + tuple(range(ndim))
    tconv.weight.data.copy_(torch.from_numpy(k.transpose(perm).copy()))
    if tconv.bias is not None and "bias" in p:
        tconv.bias.data.copy_(torch.from_numpy(_np(p["bias"])))


def _copy_convT(tconv, p, ndim):
    """flax ConvTranspose kernel [*k, in, out] -> torch [in, out, *k] with
    spatial flip (lax.conv_transpose does not mirror the kernel; torch's
    gradient-of-conv formulation does)."""
    k = _np(p["kernel"])
    k = k[(slice(None, None, -1),) * ndim]
    perm = (ndim, ndim + 1) + tuple(range(ndim))
    tconv.weight.data.copy_(torch.from_numpy(k.transpose(perm).copy()))
    if tconv.bias is not None and "bias" in p:
        tconv.bias.data.copy_(torch.from_numpy(_np(p["bias"])))


def _copy_resblock(trb, p, ndim):
    _copy_conv(trb.conv1, p["conv1"], ndim)
    _copy_conv(trb.conv2, p["conv2"], ndim)
    if trb.downsample:
        _copy_conv(trb.conv3, p["conv3"], ndim)


def _unetr_pair(img, patch, feature_size=4, depth=4, skip=True, ndim=2):
    kw = dict(img_size=(img,) * ndim, patch_size=patch, in_chans=1,
              embed_dim=32, depth=depth, num_heads=4)
    model = UNETR(
        num_classes=3, class_token=False, default_vars=("ct",),
        feature_size=feature_size, skip_connection=skip,
        twoD=(ndim == 2), attn_impl=AttnImpl.EINSUM, gelu_approx=False, **kw,
    )
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 1) + (img,) * ndim).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x), None, None, None)[
        "params"
    ]

    tm = ref_arch.UNETR(
        num_classes=3, class_token=False, default_vars=["ct"],
        feature_size=feature_size, skip_connection=skip, linear_decoder=False,
        twoD=(ndim == 2), sqrt_len=0, **kw,
    )
    tm.eval()
    with torch.no_grad():
        _copy_vit_trunk(tm, params, depth)
        if skip:
            _copy_resblock(tm.encoder1.layer, params["encoder1"]["layer"], ndim)
            for enc_name, n_layer in (("encoder2", 2), ("encoder3", 1),
                                      ("encoder4", 0)):
                tenc, penc = getattr(tm, enc_name), params[enc_name]
                _copy_convT(tenc.transp_conv_init, penc["transp_conv_init"], ndim)
                for i in range(n_layer):
                    _copy_convT(tenc.blocks[i][0], penc[f"up_{i}"], ndim)
                    _copy_resblock(tenc.blocks[i][1], penc[f"res_{i}"], ndim)
            for dec_name in ("decoder5", "decoder4", "decoder3", "decoder2"):
                tdec, pdec = getattr(tm, dec_name), params[dec_name]
                _copy_convT(tdec.transp_conv, pdec["transp_conv"], ndim)
                _copy_resblock(tdec.conv_block, pdec["conv_block"], ndim)
        else:
            for dec_name in ("decoder5", "decoder4", "decoder3", "decoder2"):
                _copy_convT(getattr(tm, dec_name).transp_conv,
                            params[dec_name]["transp_conv"], ndim)
        _copy_conv(tm.out.conv, params["out"]["conv"], ndim)
    return model, params, tm, x


def test_unetr_skip_matches_reference_matched_size():
    """img == feat*16: decoder2 upsamples by 2, no resize. depth=4 ->
    skip_indices [1,2,3] (reference `simple/arch.py:800-803`)."""
    model, params, tm, x = _unetr_pair(img=32, patch=16)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), ("ct",)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 3, 32, 32)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_unetr_skip_matches_reference_resize_path():
    """img != feat*16: dec1 is align-corners-resized to img_size before
    decoder2 (upsample_kernel_size=1) (`simple/arch.py:888-905,984-989`).

    The reference hard-codes mode='trilinear' in this Upsample even when
    twoD (`simple/arch.py:947`) — torch rejects 4D input with trilinear, so
    the reference's 2D resize path is un-runnable as written (latent quirk,
    same family as SURVEY.md "do not replicate" #3). Shim the evident intent
    (bilinear for 2D) so the rest of the wiring runs as the oracle."""
    model, params, tm, x = _unetr_pair(img=32, patch=8)
    tm.upsample = torch.nn.Upsample(
        size=(32, 32), mode="bilinear", align_corners=True
    )
    with torch.no_grad():
        want = tm(torch.from_numpy(x), ("ct",)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_unetr_noskip_matches_reference():
    """MyUnetBlock chain (`simple/arch.py:908-947`)."""
    model, params, tm, x = _unetr_pair(img=32, patch=16, skip=False)
    with torch.no_grad():
        want = tm(torch.from_numpy(x), ("ct",)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# DiffusionVIT vs the actual reference module
# ---------------------------------------------------------------------------


def _diffusion_pair(time_steps=50):
    """DiffusionVIT transplant pair: (model, params, tm). Shared by the
    forward-parity test and the training-curve test. Applies the 2-line
    arity fix for reference quirk #3 (SURVEY.md): `_pos_embed` takes
    (x, seq_ps) but DiffusionVIT.forward_features calls `_pos_embed(x)` —
    un-runnable as written; the evident intent (seq_ps=None) is restored
    with an instance-level shim so the reference code itself is the oracle
    for everything else."""
    import types

    from ucf_vit_tpu.models import DiffusionVIT

    dec = dict(decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=4,
               mlp_ratio_decoder=4.0)
    model = DiffusionVIT(
        class_token=False, default_vars=("r", "g", "b"), time_steps=time_steps,
        linear_decoder=False, attn_impl=AttnImpl.EINSUM, gelu_approx=False,
        **dec, **CFG,
    )
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    t = np.asarray([3, 40], np.int64)
    params = model.init(
        jax.random.key(0), jnp.asarray(x), jnp.asarray(t)
    )["params"]

    tm = ref_arch.DiffusionVIT(
        class_token=False, default_vars=["r", "g", "b"], time_steps=time_steps,
        linear_decoder=False, weight_init="skip", **dec, **CFG,
    )
    tm._pos_embed = types.MethodType(
        lambda self, xx: ref_arch.VIT._pos_embed(self, xx, None), tm
    )
    tm.eval()
    with torch.no_grad():
        _copy_vit_trunk(tm, params, CFG["depth"])
        # the sinusoidal time table is a computed constant in both: assert
        # equality instead of copying (layout parity, interleaved sin/cos)
        np.testing.assert_allclose(
            tm.temporalEmbeddings.embeddings.numpy(),
            np.asarray(
                model.bind({"params": params})._time_table, np.float32
            ),
            atol=1e-5,  # torch builds the table in f32, we use f64
        )
        _copy_linear(tm.timeEmbeddingMap.linear1,
                     params["time_embedding_map"]["linear1"])
        _copy_linear(tm.timeEmbeddingMap.linear2,
                     params["time_embedding_map"]["linear2"])
        _copy_linear(tm.decoder_embed, params["decoder_embed"])
        tm.decoder_pos_embed.data.copy_(
            torch.from_numpy(_np(params["decoder_pos_embed"]))
        )
        _copy_block(tm.decoder_blocks[0], params["decoder_blocks_0"])
        _copy_ln(tm.decoder_norm, params["decoder_norm"])
        _copy_linear(tm.decoder_pred, params["decoder_pred"])
    return model, params, tm


def test_diffusion_vit_matches_reference():
    """Time-embedding (sinusoidal table -> EmbeddingDenseLayer) + encoder +
    transformer decoder (`simple/arch.py:1115-1283`)."""
    model, params, tm = _diffusion_pair()
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    t = np.asarray([3, 40], np.int64)
    with torch.no_grad():
        want = tm(
            torch.from_numpy(x), torch.from_numpy(t), ("r", "g", "b")
        ).numpy()

    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t))
    )
    assert got.shape == want.shape == (2, 16, 192)  # [B, L, p^2 * C]
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# Variable aggregation (VariableMapping_Attention) vs the reference
# ---------------------------------------------------------------------------


def test_varagg_matches_reference():
    """use_varemb with V>1 channels: per-variable embeds + var_embed add +
    1-query cross-attention aggregation (`simple/arch.py:414-432`,
    `simple/building_blocks.py:301-373`). The reference's shared-PatchEmbed
    quirk (#7, one instance in the ModuleList) is made irrelevant by copying
    OUR independent per-variable weights into each reference slot."""
    model = VIT(
        num_classes=5, class_token=True, default_vars=("a", "b", "c"),
        use_varemb=True, attn_impl=AttnImpl.EINSUM, gelu_approx=False, **CFG,
    )
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    var_ids = model.get_var_ids(("a", "b", "c"))
    params = model.init(jax.random.key(0), jnp.asarray(x), var_ids)["params"]

    # reference quirk #1 (SURVEY.md "do not replicate"): the use_varemb
    # non-adaptive branch passes the typo'd kwarg `sqrt_len_meth=` to
    # PatchEmbed (`simple/arch.py:217`) -> TypeError as written. Patch the
    # evident intent (sqrt_len_method) so the path runs as the oracle.
    import UCF_VIT.simple.building_blocks as ref_bb

    orig_init = ref_bb.PatchEmbed.__init__

    def _fixed_init(self, *a, **kw):
        if "sqrt_len_meth" in kw:
            kw["sqrt_len_method"] = kw.pop("sqrt_len_meth")
        orig_init(self, *a, **kw)

    ref_bb.PatchEmbed.__init__ = _fixed_init
    try:
        tm = ref_arch.VIT(
            num_classes=5, class_token=True, default_vars=["a", "b", "c"],
            use_varemb=True, single_channel=False, **CFG,
        )
    finally:
        ref_bb.PatchEmbed.__init__ = orig_init
    tm.eval()
    with torch.no_grad():
        # reference quirk #7: token_embeds is a ModuleList of the SAME
        # PatchEmbed instance; copying into [i] overwrites all slots — use
        # our variable-0 weights so at least the shared instance is defined,
        # then verify the quirk and overwrite with per-var weights where the
        # instances are actually distinct.
        distinct = len({id(m) for m in tm.token_embeds}) == len(tm.token_embeds)
        for i in range(3 if distinct else 1):
            pe = params[f"token_embed_{i if distinct else 0}"]["proj"]
            k = _np(pe["kernel"]).transpose(3, 2, 0, 1)
            tm.token_embeds[i].proj.weight.data.copy_(torch.from_numpy(k.copy()))
            tm.token_embeds[i].proj.bias.data.copy_(
                torch.from_numpy(_np(pe["bias"]))
            )
        tm.var_embed.data.copy_(torch.from_numpy(_np(params["var_embed"])))
        tm.var_query.data.copy_(torch.from_numpy(_np(params["var_query"])))
        _copy_linear(tm.var_agg.q, params["var_agg"]["q"])
        _copy_linear(tm.var_agg.kv, params["var_agg"]["kv"])
        _copy_linear(tm.var_agg.proj, params["var_agg"]["proj"])
        if tm.pos_embed is not None:
            tm.pos_embed.data.copy_(torch.from_numpy(_np(params["pos_embed"])))
        tm.cls_token.data.copy_(torch.from_numpy(_np(params["cls_token"])))
        for i in range(CFG["depth"]):
            _copy_block(tm.blocks[i], params[f"blocks_{i}"])
        _copy_ln(tm.norm, params["norm"])
        _copy_linear(tm.head, params["head"])
        want = tm(torch.from_numpy(x), ("a", "b", "c")).numpy()

    if not distinct:
        # the quirk is real: force our model to share variable-0's embed too
        import flax

        params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else params
        for i in (1, 2):
            params[f"token_embed_{i}"] = jax.tree.map(
                lambda x: x, params["token_embed_0"]
            )
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), var_ids)
    )
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)
