"""Training-CURVE parity against the live torch reference (VERDICT r3 #2).

Weight-transplant forward/grad parity was already proven
(test_reference_parity.py); this closes the last north-star clause at the
curve level: the ACTUAL reference training path — its VIT
(`/root/reference/src/UCF_VIT/simple/arch.py`), its CrossEntropyLoss
training_step (`training_scripts/train_class_simple.py:24-28`), its AdamW
no-decay grouping (`utils/misc.py:58-84`) and its
LinearWarmupCosineAnnealingLR (`utils/lr_scheduler.py:12`), stepped
per-iteration like the script does (`train_class_simple.py:346-357`) — is
trained side-by-side with this framework's optimizer/metrics stack from
converted-identical init on an identical deterministic batch stream
(f32, gelu exact, attn/proj drop 0), and the per-step losses must agree.

Measured headroom: max per-step |diff| is ~4e-7 over 50 steps; the assert
is 1e-4, two orders looser, so only a real semantic divergence (optimizer
math, schedule off-by-one, loss reduction) can trip it.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from tests._reference_shims import import_reference_arch  # noqa: E402
from tests.test_reference_parity import CFG, _copy_linear, _copy_vit_trunk  # noqa: E402
from ucf_vit_tpu.models import VIT  # noqa: E402
from ucf_vit_tpu.ops.attention import AttnImpl  # noqa: E402
from ucf_vit_tpu.utils.metrics import cross_entropy  # noqa: E402
from ucf_vit_tpu.utils.optim import configure_optimizer  # noqa: E402

ref_arch = import_reference_arch()
from UCF_VIT.utils.lr_scheduler import LinearWarmupCosineAnnealingLR  # noqa: E402
from UCF_VIT.utils.metrics import masked_mse as ref_masked_mse  # noqa: E402
from UCF_VIT.utils.misc import patchify as ref_patchify  # noqa: E402

N_STEPS = 50
LR, B1, B2, WD = 1e-3, 0.9, 0.95, 0.05
WARM, WSTART, ETA = 5, 1e-8, 1e-8
N_CLASSES = 5


@pytest.mark.slow
def test_classification_training_curve_matches_reference():
    model = VIT(
        num_classes=N_CLASSES, class_token=True, default_vars=("r", "g", "b"),
        attn_impl=AttnImpl.EINSUM, gelu_approx=False, **CFG,
    )
    rng = np.random.default_rng(0)
    batches = [
        (
            rng.normal(size=(4, 3, 32, 32)).astype(np.float32),
            rng.integers(0, N_CLASSES, size=(4,)),
        )
        for _ in range(10)
    ]
    params = model.init(jax.random.key(0), jnp.asarray(batches[0][0]))["params"]

    # ---- this framework's step: optax AdamW + closed-form warmup-cosine
    tx = configure_optimizer(
        params, lr=LR, beta_1=B1, beta_2=B2, weight_decay=WD,
        warmup_steps=WARM, max_steps=N_STEPS,
        warmup_start_lr=WSTART, eta_min=ETA,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            return cross_entropy(model.apply({"params": p}, x), y)

        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, l

    ours = []
    p = params
    for i in range(N_STEPS):
        x, y = batches[i % len(batches)]
        p, opt_state, l = step(p, opt_state, jnp.asarray(x), jnp.asarray(y))
        ours.append(float(l))

    # ---- the reference's step, from transplanted-identical init
    tm = ref_arch.VIT(
        num_classes=N_CLASSES, class_token=True,
        default_vars=["r", "g", "b"], **CFG,
    )
    with torch.no_grad():
        _copy_vit_trunk(tm, params, CFG["depth"])
        _copy_linear(tm.head, params["head"])
    tm.train()

    # the reference's configure_optimizer grouping (utils/misc.py:58-84)
    decay, no_decay = [], []
    for name, m in tm.named_parameters():
        (
            no_decay
            if (
                "var_embed" in name
                or "pos_embed" in name
                or "time_pos_embed" in name
            )
            else decay
        ).append(m)
    topt = torch.optim.AdamW(
        [
            {"params": decay, "lr": LR, "betas": (B1, B2), "weight_decay": WD},
            {"params": no_decay, "lr": LR, "betas": (B1, B2), "weight_decay": 0},
        ]
    )
    tsched = LinearWarmupCosineAnnealingLR(topt, WARM, N_STEPS, WSTART, ETA)
    crit = nn.CrossEntropyLoss()

    theirs = []
    for i in range(N_STEPS):
        x, y = batches[i % len(batches)]
        topt.zero_grad()
        out = tm(torch.from_numpy(x), ("r", "g", "b"))
        loss = crit(out, torch.from_numpy(y.astype(np.int64)))
        loss.backward()
        topt.step()
        tsched.step()
        theirs.append(float(loss.detach()))

    diff = np.abs(np.asarray(ours) - np.asarray(theirs))
    assert diff.max() < 1e-4, (
        f"training curves diverged: max per-step diff {diff.max():.2e} at "
        f"step {int(diff.argmax())}\nours:   {ours[:5]}...\ntheirs: {theirs[:5]}..."
    )
    # the comparison must be on a curve that actually moved
    assert ours[-1] < ours[0] - 0.05, f"degenerate curve: {ours[0]} -> {ours[-1]}"


@pytest.mark.slow
def test_mae_training_curve_matches_reference():
    """The FLAGSHIP path (train_masked_*, SURVEY §3.2) at the curve level:
    the reference's own MAE module, its maskMSE training_step
    (`training_scripts/train_masked_simple.py:35-41` — masked_mse over
    patchify targets, both imported LIVE from `UCF_VIT.utils`), its AdamW
    grouping and LR schedule, stepped side-by-side with this framework's
    MAE + ops.patchify + utils.metrics.masked_mse from transplanted-
    identical init. Masking noise is drawn once per step in numpy and
    injected into BOTH `random_masking`s (reference `simple/arch.py:663`
    takes `noise=`; ours takes `mask_noise=`), so the keep-sets are
    identical and the curves must agree."""
    from tests.test_reference_parity import _mae_pair
    from ucf_vit_tpu.ops.patchify import patchify as our_patchify
    from ucf_vit_tpu.utils.metrics import masked_mse as our_masked_mse

    model, params, tm, _ = _mae_pair(mask_ratio=0.75)
    patch, n_tok = 8, 16  # 32^2 / 8^2 tokens (CFG in test_reference_parity)
    rng = np.random.default_rng(3)
    # smooth (4x4 noise bilinearly upsampled to 32x32) so masked patches are
    # PREDICTABLE from their neighbors — pure-noise targets leave the loss at
    # its irreducible floor and the moved-curve check below would be vacuous
    def smooth_batch():
        lo = rng.normal(size=(4, 3, 4, 4)).astype(np.float32)
        t = jax.image.resize(jnp.asarray(lo), (4, 3, 32, 32), "bilinear")
        return np.asarray(t)

    batches = [smooth_batch() for _ in range(10)]
    noises = [rng.random((4, n_tok)).astype(np.float32)
              for _ in range(N_STEPS)]
    # _mae_pair already transplanted identical weights (params are
    # batch-shape-agnostic, so its batch-2 init serves batch-4 batches)

    tx = configure_optimizer(
        params, lr=LR, beta_1=B1, beta_2=B2, weight_decay=WD,
        warmup_steps=WARM, max_steps=N_STEPS,
        warmup_start_lr=WSTART, eta_min=ETA,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, noise):
        def loss_fn(p):
            pred, mask = model.apply({"params": p}, x, mask_noise=noise)
            return our_masked_mse(pred, our_patchify(x, patch, True), mask)

        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, l

    ours = []
    p = params
    for i in range(N_STEPS):
        x = batches[i % len(batches)]
        p, opt_state, l = step(
            p, opt_state, jnp.asarray(x), jnp.asarray(noises[i])
        )
        ours.append(float(l))

    # ---- reference side: inject the same per-step noise
    tm.train()
    step_idx = {"i": 0}
    orig_masking = tm.random_masking

    def injected_masking(sequence, noise=None):
        return orig_masking(
            sequence, noise=torch.from_numpy(noises[step_idx["i"]])
        )

    tm.random_masking = injected_masking

    decay, no_decay = [], []
    for name, m in tm.named_parameters():
        (
            no_decay
            if (
                "var_embed" in name
                or "pos_embed" in name
                or "time_pos_embed" in name
            )
            else decay
        ).append(m)
    topt = torch.optim.AdamW(
        [
            {"params": decay, "lr": LR, "betas": (B1, B2), "weight_decay": WD},
            {"params": no_decay, "lr": LR, "betas": (B1, B2), "weight_decay": 0},
        ]
    )
    tsched = LinearWarmupCosineAnnealingLR(topt, WARM, N_STEPS, WSTART, ETA)

    theirs = []
    for i in range(N_STEPS):
        step_idx["i"] = i
        x = torch.from_numpy(batches[i % len(batches)])
        topt.zero_grad()
        output, mask = tm(x, ("r", "g", "b"))
        loss = ref_masked_mse(output, ref_patchify(x, patch, True), mask)
        loss.backward()
        topt.step()
        tsched.step()
        theirs.append(float(loss.detach()))

    diff = np.abs(np.asarray(ours) - np.asarray(theirs))
    assert diff.max() < 1e-4, (
        f"MAE training curves diverged: max per-step diff {diff.max():.2e} "
        f"at step {int(diff.argmax())}\nours:   {ours[:5]}...\n"
        f"theirs: {theirs[:5]}..."
    )
    # measured: 0.637 -> 0.563 (0.88x) over the 50 steps; bar at 0.95x only
    # rejects a curve that did not move at all
    assert ours[-1] < 0.95 * ours[0], f"degenerate curve: {ours[0]} -> {ours[-1]}"


def _ref_optimizer(tm):
    """The reference's configure_optimizer grouping (utils/misc.py:58-84) +
    LinearWarmupCosineAnnealingLR, as built inline by both r4 curve tests."""
    decay, no_decay = [], []
    for name, m in tm.named_parameters():
        (
            no_decay
            if (
                "var_embed" in name
                or "pos_embed" in name
                or "time_pos_embed" in name
            )
            else decay
        ).append(m)
    topt = torch.optim.AdamW(
        [
            {"params": decay, "lr": LR, "betas": (B1, B2), "weight_decay": WD},
            {"params": no_decay, "lr": LR, "betas": (B1, B2), "weight_decay": 0},
        ]
    )
    tsched = LinearWarmupCosineAnnealingLR(topt, WARM, N_STEPS, WSTART, ETA)
    return topt, tsched


def _run_curves(step_ours, step_theirs, n=N_STEPS, tol=1e-4, moved=0.95):
    ours, theirs = [], []
    for i in range(n):
        ours.append(float(step_ours(i)))
    for i in range(n):
        theirs.append(float(step_theirs(i)))
    diff = np.abs(np.asarray(ours) - np.asarray(theirs))
    assert diff.max() < tol, (
        f"training curves diverged: max per-step diff {diff.max():.2e} at "
        f"step {int(diff.argmax())}\nours:   {ours[:5]}...\ntheirs: {theirs[:5]}..."
    )
    assert ours[-1] < moved * ours[0], (
        f"degenerate curve: {ours[0]} -> {ours[-1]}"
    )
    return ours, theirs


@pytest.mark.slow
def test_unetr_training_curve_matches_reference():
    """UNETR under its script's loss (DiceCELoss(to_onehot_y=True,
    softmax=True, squared_pred=True, smooth_nr=0.0, smooth_dr=1e-6),
    `train_unetr_simple.py:34-40`). monai is not in this image, so the torch
    side carries a from-the-definition reimplementation of exactly those
    MONAI semantics (~15 lines below); the jax side is the shipped
    `utils.metrics.dice_ce_loss`. The curves agreeing per-step proves the
    conv-decoder model + grads + optimizer + schedule dynamics match under
    the task loss from transplanted-identical init."""
    import torch.nn.functional as torchF

    from tests.test_reference_parity import _unetr_pair
    from ucf_vit_tpu.utils.metrics import dice_ce_loss

    ncls = 3
    model, params, tm, _ = _unetr_pair(img=32, patch=16, skip=True, ndim=2)
    rng = np.random.default_rng(7)
    # blobby labels correlated with the input so there is signal to learn
    batches = []
    for _ in range(10):
        x = rng.normal(size=(2, 1, 32, 32)).astype(np.float32)
        lab = np.clip(
            np.floor((x[:, 0] - x.min()) / (x.max() - x.min()) * ncls), 0,
            ncls - 1,
        ).astype(np.int32)[:, None]
        batches.append((x, lab))

    tx = configure_optimizer(
        params, lr=LR, beta_1=B1, beta_2=B2, weight_decay=WD,
        warmup_steps=WARM, max_steps=N_STEPS,
        warmup_start_lr=WSTART, eta_min=ETA,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, lab):
        def loss_fn(p):
            logits = model.apply({"params": p}, x)
            return dice_ce_loss(logits, lab, ncls)

        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, l

    state = {"p": params, "o": opt_state}

    def ours(i):
        x, lab = batches[i % len(batches)]
        state["p"], state["o"], l = step(
            state["p"], state["o"], jnp.asarray(x), jnp.asarray(lab)
        )
        return l

    tm.train()
    topt, tsched = _ref_optimizer(tm)

    def ref_dice_ce(output, label):
        # MONAI DiceCELoss(to_onehot_y, softmax, squared_pred, smooth_nr=0,
        # smooth_dr=1e-6, include_background, reduction=mean), from the
        # definition: dice per (batch, class) over spatial + standard CE
        lab = label.squeeze(1).long()
        ce = nn.CrossEntropyLoss()(output, lab)
        p = torch.softmax(output, dim=1)
        oh = torchF.one_hot(lab, ncls).permute(0, 3, 1, 2).float()
        dims = (2, 3)
        inter = (p * oh).sum(dims)
        denom = (p**2).sum(dims) + (oh**2).sum(dims)
        dice = 1.0 - (2.0 * inter + 0.0) / (denom + 1e-6)
        return ce + dice.mean()

    def theirs(i):
        x, lab = batches[i % len(batches)]
        topt.zero_grad()
        out = tm(torch.from_numpy(x), ("ct",))
        loss = ref_dice_ce(out, torch.from_numpy(lab))
        loss.backward()
        topt.step()
        tsched.step()
        return float(loss.detach())

    _run_curves(ours, theirs)


@pytest.mark.slow
def test_sap_training_curve_matches_reference():
    """SAP under its script's loss — the reference's OWN DiceBLoss imported
    live (`train_sap_simple.py:28-46`; `UCF_VIT/utils/metrics.py:95-121`) —
    vs this framework's `utils.metrics.dice_b_loss`, from transplanted-
    identical init through the sqrt-len adaptive forward."""
    from tests.test_reference_parity import _sap_pair
    from UCF_VIT.utils.metrics import DiceBLoss
    from ucf_vit_tpu.utils.metrics import dice_b_loss

    ncls = 3
    model, params, tm, x0, seq_ps0 = _sap_pair(num_classes=ncls)
    side = x0.shape[-1]
    rng = np.random.default_rng(8)
    batches = []
    for _ in range(10):
        x = rng.normal(size=x0.shape).astype(np.float32)
        seq_ps = rng.normal(size=seq_ps0.shape).astype(np.float32)
        ids = np.clip(
            np.floor((x[:, 0] - x.min()) / (x.max() - x.min()) * ncls), 0,
            ncls - 1,
        ).astype(np.int64)
        onehot = np.eye(ncls, dtype=np.float32)[ids].transpose(0, 3, 1, 2)
        batches.append((x, seq_ps, onehot))

    tx = configure_optimizer(
        params, lr=LR, beta_1=B1, beta_2=B2, weight_decay=WD,
        warmup_steps=WARM, max_steps=N_STEPS,
        warmup_start_lr=WSTART, eta_min=ETA,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, seq_ps, lab):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, None, seq_ps)
            return dice_b_loss(logits, lab)

        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, l

    state = {"p": params, "o": opt_state}

    def ours(i):
        x, seq_ps, lab = batches[i % len(batches)]
        state["p"], state["o"], l = step(
            state["p"], state["o"], jnp.asarray(x), jnp.asarray(seq_ps),
            jnp.asarray(lab),
        )
        return l

    tm.train()
    topt, tsched = _ref_optimizer(tm)
    crit = DiceBLoss(num_class=ncls)

    def theirs(i):
        x, seq_ps, lab = batches[i % len(batches)]
        topt.zero_grad()
        out = tm(torch.from_numpy(x), ("ct",), seq_ps=torch.from_numpy(seq_ps))
        loss = crit(out, torch.from_numpy(lab))
        loss.backward()
        topt.step()
        tsched.step()
        return float(loss.detach())

    _run_curves(ours, theirs)


@pytest.mark.slow
def test_diffusion_training_curve_matches_reference():
    """DiffusionVIT under its script's step (`train_diffusion_fsdp.py:37-45`
    + the noising at `:510-518`): t ~ randint, e ~ randn, data <-
    sqrt(a)*data + sqrt(1-a)*e with a = DDPM alpha-bar[t], net predicts e,
    MSE(unpatchify(out), e). The reference's DDPM_Scheduler and unpatchify
    are imported LIVE; ours are models/ddpm.ddpm_schedule + ops.patchify.
    t/e are drawn once per step in numpy and fed to BOTH sides, so the
    curves must agree — this pins the reference-quirk surface (t indexing on
    CPU, broadcast-shape noising) the r4 verdict called out."""
    from UCF_VIT.ddpm.ddpm import DDPM_Scheduler
    from UCF_VIT.utils.misc import unpatchify as ref_unpatchify

    from tests.test_reference_parity import _diffusion_pair
    from ucf_vit_tpu.models.ddpm import ddpm_schedule
    from ucf_vit_tpu.ops.patchify import unpatchify as our_unpatchify
    from ucf_vit_tpu.utils.metrics import mse as our_mse

    T = 50
    model, params, tm = _diffusion_pair(time_steps=T)
    rng = np.random.default_rng(9)
    B = 2
    # smooth images (learnable structure under noise)
    def smooth_batch():
        lo = rng.normal(size=(B, 3, 4, 4)).astype(np.float32)
        return np.asarray(
            jax.image.resize(jnp.asarray(lo), (B, 3, 32, 32), "bilinear")
        )

    batches = [smooth_batch() for _ in range(10)]
    ts = [rng.integers(0, T, size=(B,)).astype(np.int64) for _ in range(N_STEPS)]
    es = [rng.normal(size=(B, 3, 32, 32)).astype(np.float32)
          for _ in range(N_STEPS)]

    sched = ddpm_schedule(T)

    tx = configure_optimizer(
        params, lr=LR, beta_1=B1, beta_2=B2, weight_decay=WD,
        warmup_steps=WARM, max_steps=N_STEPS,
        warmup_start_lr=WSTART, eta_min=ETA,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, t, e):
        a = sched.alpha_bar[t].reshape(B, 1, 1, 1)
        noised = jnp.sqrt(a) * x + jnp.sqrt(1.0 - a) * e

        def loss_fn(p):
            out = model.apply({"params": p}, noised, t)
            img = our_unpatchify(out, noised.shape, 8, True)
            return our_mse(img, e)

        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, l

    state = {"p": params, "o": opt_state}

    def ours(i):
        x = batches[i % len(batches)]
        state["p"], state["o"], l = step(
            state["p"], state["o"], jnp.asarray(x), jnp.asarray(ts[i]),
            jnp.asarray(es[i]),
        )
        return l

    tm.train()
    topt, tsched_lr = _ref_optimizer(tm)
    ref_sched = DDPM_Scheduler(num_time_steps=T)
    crit = nn.MSELoss()

    def theirs(i):
        x = torch.from_numpy(batches[i % len(batches)])
        t = torch.from_numpy(ts[i])
        e = torch.from_numpy(es[i])
        a = ref_sched.alpha[t].view(B, 1, 1, 1)
        noised = torch.sqrt(a) * x + torch.sqrt(1 - a) * e
        topt.zero_grad()
        out = tm(noised, t, ("r", "g", "b"))
        img = ref_unpatchify(out, noised, 8, True)
        loss = crit(img, e)
        loss.backward()
        topt.step()
        tsched_lr.step()
        return float(loss.detach())

    # diffusion's target e is fresh noise every step: the loss trends down
    # slowly; require strict improvement rather than the 0.95x bar
    _run_curves(ours, theirs, moved=1.0)
