"""Focal loss and the prior-modulated logit transform.

Reference: /root/reference/ops.py:438-482 (binary_focal_loss_with_logits)
and /root/reference/upt_tip_cache_model_free_finetune_distill3.py:1349-1354
(the log(prior / (1 + e^-x - prior)) modulation fed into the focal loss).
"""
import jax
import jax.numpy as jnp


def _bce_with_logits(x, y):
    # numerically stable BCE-with-logits: max(x,0) - x*y + log1p(exp(-|x|))
    return jnp.clip(x, 0, None) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))


def binary_focal_loss_with_logits(x, y, alpha: float = 0.5,
                                  gamma: float = 2.0, reduction: str = "mean",
                                  eps: float = 1e-6, weights=None):
    """L = |1-y-alpha| * (|y-sigmoid(x)| + eps)^gamma * BCEwithLogits(x, y).

    ``weights`` (optional, same shape) masks entries before reduction —
    the static-shape replacement for the reference's nonzero-prior
    gathering (upt...py:1321-1325).
    """
    loss = (jnp.abs(1.0 - y - alpha)
            * (jnp.abs(y - jax.nn.sigmoid(x)) + eps) ** gamma
            * _bce_with_logits(x, y))
    if weights is not None:
        loss = loss * weights
    if reduction == "mean":
        return loss.mean() if weights is None else loss.sum() / weights.sum()
    if reduction == "sum":
        return loss.sum()
    if reduction == "none":
        return loss
    raise ValueError(f"Unsupported reduction {reduction}")


def prior_modulated_logits(logits, prior, eps: float = 1e-8):
    """log(prior / (1 + e^-logits - prior) + eps) (upt...py:1349-1352).

    ``prior`` is the product of the human/object prior scores; entries with
    prior == 0 are excluded from the loss by the caller's weight mask, so we
    only need the value to stay finite there.
    """
    return jnp.log(prior / (1.0 + jnp.exp(-logits) - prior) + eps)
