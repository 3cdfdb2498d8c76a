"""Losses and metrics (jnp, jit-safe).

Capability parity with reference `src/UCF_VIT/utils/metrics.py` plus the
losses the reference pulls from torch/MONAI at script level:
- masked_mse                  (`metrics.py:11`)
- MSE                         (`nn.MSELoss`, `train_masked_fsdp.py:42`)
- cross-entropy + accuracy    (`nn.CrossEntropyLoss`, `train_class_simple.py:27`)
- DiceBLoss                   (`metrics.py:95`, SAP training)
- DiceCELoss                  (MONAI, `train_unetr_simple.py:38` —
                               to_onehot_y, softmax, squared_pred, smooth_nr=0,
                               smooth_dr=1e-6)
- DiceMetric                  (MONAI, `train_unetr_simple.py:401` —
                               include_background=False, mean reduction)
- adaptive_patching_mse       (`metrics.py:19`) — the reference's version is
                              image-space and defined-but-unused; here we
                              provide the token-space equivalent that runs
                              on TPU.

Everything here takes logits/predictions as produced by the models (channels
first for dense outputs, [B, L, F] for token outputs) and returns f32 scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return jnp.mean((pred - target) ** 2)


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MSE over masked tokens only. Parity: reference `metrics.py:11-17`.

    pred/target: [B, L, F]; mask: [B, L] with 1 = masked (loss counted).
    """
    loss = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    loss = loss.mean(axis=-1)
    mask = mask.astype(jnp.float32)
    return (loss * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Softmax cross entropy with integer labels. [B, C] x [B] -> scalar."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)
    return nll.mean()


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def token_masked_mse_adaptive(
    pred: jnp.ndarray, target_tokens: jnp.ndarray, seq_size: jnp.ndarray
) -> jnp.ndarray:
    """Token-space adaptive-patching MSE (TPU-native form).

    The reference `adaptive_patching_mse` (`metrics.py:19-92`) resizes each
    predicted patch back to its true leaf size with a quadruple host-side
    Python loop — O(B*L*C) CPU work per step. The equivalent objective in
    token space: MSE over serialized target patches, skipping zero-size
    (padding) leaves. pred/target: [B, L, F]; seq_size: [B, L] leaf sizes.
    """
    valid = (seq_size > 0).astype(jnp.float32)
    loss = ((pred.astype(jnp.float32) - target_tokens.astype(jnp.float32)) ** 2).mean(-1)
    return (loss * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def dice_b_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    weight: float = 0.5,
    smooth: float = 1.0,
    apply_sigmoid: bool = True,
) -> jnp.ndarray:
    """Dice + binary-cross-entropy over non-background channels.

    Parity: reference `DiceBLoss` (`metrics.py:95-121`): sigmoid activation,
    channels 1: flattened, dice_loss and BCE mixed by `weight`.
    logits/targets: [B, C, *spatial] (targets one-hot in [0, 1]).
    """
    x = logits.astype(jnp.float32)
    if apply_sigmoid:
        p = jax.nn.sigmoid(x[:, 1:])
        # BCE computed from logits for numerical stability (== torch
        # F.binary_cross_entropy(sigmoid(x), y)).
        z = x[:, 1:]
        bce = jnp.mean(jnp.maximum(z, 0) - z * targets[:, 1:] + jnp.log1p(jnp.exp(-jnp.abs(z))))
    else:
        p = x[:, 1:]
        eps = 1e-7
        pc = jnp.clip(p, eps, 1 - eps)
        bce = -jnp.mean(
            targets[:, 1:] * jnp.log(pc) + (1 - targets[:, 1:]) * jnp.log(1 - pc)
        )
    t = targets[:, 1:].astype(jnp.float32)
    intersection = jnp.sum(p * t)
    dice = 1.0 - (2.0 * intersection + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)
    return weight * bce + (1 - weight) * dice


def dice_ce_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int,
    smooth_nr: float = 0.0,
    smooth_dr: float = 1e-6,
    squared_pred: bool = True,
    include_background: bool = True,
) -> jnp.ndarray:
    """MONAI DiceCELoss(to_onehot_y=True, softmax=True, squared_pred=True,
    smooth_nr=0.0, smooth_dr=1e-6) semantics (`train_unetr_simple.py:38`).

    logits: [B, C, *spatial]; labels: [B, 1, *spatial] integer class ids.
    Dice is computed per (batch, class) over spatial dims then averaged;
    CE is standard softmax cross entropy; total = dice + ce.
    """
    x = logits.astype(jnp.float32)
    b, c = x.shape[0], x.shape[1]
    lbl = labels.reshape(b, -1).astype(jnp.int32)  # [B, S]
    probs = jax.nn.softmax(x, axis=1).reshape(b, c, -1)  # [B, C, S]
    onehot = jax.nn.one_hot(lbl, c, axis=1)  # [B, C, S]

    if not include_background:
        probs = probs[:, 1:]
        onehot = onehot[:, 1:]

    intersection = jnp.sum(onehot * probs, axis=-1)  # [B, C']
    if squared_pred:
        ground = jnp.sum(onehot * onehot, axis=-1)
        pred_sum = jnp.sum(probs * probs, axis=-1)
    else:
        ground = jnp.sum(onehot, axis=-1)
        pred_sum = jnp.sum(probs, axis=-1)
    dice = 1.0 - (2.0 * intersection + smooth_nr) / (ground + pred_sum + smooth_dr)
    dice = jnp.mean(dice)

    logp = jax.nn.log_softmax(x, axis=1).reshape(b, c, -1)
    ce = -jnp.take_along_axis(logp, lbl[:, None, :], axis=1).mean()
    return dice + ce


def dice_metric(
    pred_labels: jnp.ndarray,
    true_labels: jnp.ndarray,
    num_classes: int,
    include_background: bool = False,
) -> jnp.ndarray:
    """Mean Dice over classes (and batch), NaN-safe mean like MONAI
    DiceMetric(include_background=False, reduction=MEAN, get_not_nans=True)
    (`train_unetr_simple.py:401`).

    pred_labels/true_labels: [B, *spatial] integer class ids.
    """
    b = pred_labels.shape[0]
    p = jax.nn.one_hot(pred_labels.reshape(b, -1), num_classes, axis=1)
    t = jax.nn.one_hot(true_labels.reshape(b, -1), num_classes, axis=1)
    if not include_background:
        p, t = p[:, 1:], t[:, 1:]
    intersection = jnp.sum(p * t, axis=-1)  # [B, C']
    denom = jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1)
    dice = 2.0 * intersection / jnp.maximum(denom, 1e-6)
    present = (denom > 0).astype(jnp.float32)  # MONAI returns NaN when class absent
    return jnp.sum(dice * present) / jnp.maximum(jnp.sum(present), 1.0)
