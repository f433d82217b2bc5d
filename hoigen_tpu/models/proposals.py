"""Fixed-capacity region-proposal selection and human-object pairing.

Static-shape reformulation of prepare_region_proposals and the pair
enumeration in compute_roi_embeddings
(/root/reference/upt_tip_cache_model_free_finetune_distill3.py:1361-1406,
1006-1023): instead of dynamic keep-lists, every image yields exactly
``max_instances`` human slots + ``max_instances`` object slots (score-sorted,
validity-masked) and ``max_instances * 2*max_instances`` candidate pairs.

Selection semantics (verified equivalent to the reference's three-branch
logic): among NMS-surviving detections of each group (human / non-human),
rank by score and keep the top clamp(#above-threshold, min_inst, max_inst);
the min-branch intentionally admits below-threshold detections, as the
reference does.
"""
import dataclasses

import jax
import jax.numpy as jnp

from ..ops.boxes import union_boxes
from ..ops.nms import batched_nms_mask


@dataclasses.dataclass(frozen=True)
class ProposalConfig:
    human_idx: int = 0
    box_score_thresh: float = 0.2
    min_instances: int = 3
    max_instances: int = 15
    nms_thresh: float = 0.5

    @property
    def n_slots(self) -> int:
        return 2 * self.max_instances

    @property
    def n_pairs(self) -> int:
        return self.max_instances * self.n_slots


def _select_group(scores, member, keep, cfg: ProposalConfig):
    """Top-max_instances of a group by score; valid count =
    clamp(#above-thresh, min, max) limited by group size."""
    cand = member & keep
    masked = jnp.where(cand, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(masked, cfg.max_instances)
    exists = jnp.isfinite(top_scores)
    n_above = jnp.sum(cand & (scores >= cfg.box_score_thresh))
    k = jnp.clip(n_above, cfg.min_instances, cfg.max_instances)
    valid = (jnp.arange(cfg.max_instances) < k) & exists
    return top_idx, valid


def select_region_proposals(scores, labels, boxes, cfg: ProposalConfig,
                            valid_in=None):
    """Per image: detections (N,) -> fixed slots (2*max_instances,).

    Slot layout: [0, max_inst) = humans (score-sorted), [max_inst, 2*max_inst)
    = objects. Returns (boxes, scores, labels, valid). vmap over a batch.
    """
    keep = batched_nms_mask(boxes, scores, labels, cfg.nms_thresh,
                            valid=valid_in)
    is_human = labels == cfg.human_idx
    h_idx, h_valid = _select_group(scores, is_human, keep, cfg)
    o_idx, o_valid = _select_group(scores, ~is_human, keep, cfg)
    idx = jnp.concatenate([h_idx, o_idx])
    valid = jnp.concatenate([h_valid, o_valid])
    return (jnp.where(valid[:, None], boxes[idx], 0.0),
            jnp.where(valid, scores[idx], 0.0),
            jnp.where(valid, labels[idx], 0),
            valid)


def pair_indices(cfg: ProposalConfig):
    """Static (x, y) slot indices for all candidate pairs: x over human
    slots, y over all slots (a human may be the 'object' of a pair, matching
    the reference's x != y, x < n_h enumeration)."""
    x = jnp.repeat(jnp.arange(cfg.max_instances), cfg.n_slots)
    y = jnp.tile(jnp.arange(cfg.n_slots), cfg.max_instances)
    return x, y


def make_pairs(boxes, valid, cfg: ProposalConfig):
    """boxes (..., S, 4), valid (..., S) -> pair boxes h/o/union
    (..., P, 4) and pair_valid (..., P)."""
    x, y = pair_indices(cfg)
    bh = boxes[..., x, :]
    bo = boxes[..., y, :]
    pair_valid = valid[..., x] & valid[..., y] & (x != y)
    return bh, bo, union_boxes(bh, bo), pair_valid
