"""Instance-segmentation prior losses (the Mask-RCNN experiments).

Behavior port of `awesome/measures/mask_rcnn_prior_loss.py:9-70` and
`awesome/measures/mask_rcnn_finetune_loss.py`: align per-instance prior
fields to detector masks on top of the detector's own losses. The
reference consumes torchvision Mask-RCNN output dicts; here the loss is a
pure function over (detector_loss, instance_masks, prior_masks) batches —
detector-agnostic, usable with any instance segmenter producing per-
instance mask logits.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def instance_prior_loss(
    detector_loss,
    instance_masks,
    prior_masks,
    valid_instances: Optional[jnp.ndarray] = None,
    alpha: float = 1.0,
    extra_penalty=False,
):
    """detector_loss: scalar (the detector's own summed losses);
    instance_masks: (K, H, W) mask logits (1 = object);
    prior_masks: (K, H, W) prior probabilities;
    valid_instances: (K,) bool — padded instance slots get weight 0.

    Without extra_penalty the prior fits the *thresholded* detections;
    with it, the soft (inverted) masks. Spec: `mask_rcnn_prior_loss.py:35-66`.
    """
    seg_sig = jax.nn.sigmoid(instance_masks)
    hard = (seg_sig >= 0.5).astype(seg_sig.dtype)
    soft_inv = 1.0 - seg_sig
    target = jnp.where(jnp.asarray(extra_penalty), soft_inv, hard)
    target = jax.lax.stop_gradient(target)
    per_inst = ((prior_masks - target) ** 2).mean(axis=(-2, -1))
    if valid_instances is not None:
        w = valid_instances.astype(per_inst.dtype)
        penalty = (per_inst * w).sum() / jnp.maximum(w.sum(), 1.0)
    else:
        penalty = per_inst.mean()
    return detector_loss + alpha * penalty


def instance_finetune_loss(
    detector_loss,
    instance_masks,
    prior_masks,
    valid_instances: Optional[jnp.ndarray] = None,
    alpha: float = 1.0,
):
    """Finetune variant: gradients flow into the DETECTOR masks, pulling
    them toward the (frozen) prior — the prior regularizes detection.
    Spec: `mask_rcnn_finetune_loss.py` (roles of the two mask sets swap).
    """
    prior = jax.lax.stop_gradient(prior_masks)
    seg_sig = jax.nn.sigmoid(instance_masks)
    per_inst = ((seg_sig - (1.0 - prior)) ** 2).mean(axis=(-2, -1))
    if valid_instances is not None:
        w = valid_instances.astype(per_inst.dtype)
        penalty = (per_inst * w).sum() / jnp.maximum(w.sum(), 1.0)
    else:
        penalty = per_inst.mean()
    return detector_loss + alpha * penalty
