"""Trainable/frozen parameter partitioning.

Mirrors the reference's requires_grad selection
(/root/reference/main_tip_finetune.py:952-999): the DETR detector and DINO
are fully frozen; within CLIP only the visual positional embedding,
ln_post, the visual projection and all adapter weights train; every UPT
head parameter trains. Two learning-rate groups: CLIP-subtree params at
lr_vit, the rest at lr_head (:988-999).
"""
import jax


def clip_trainable(path_parts) -> bool:
    """Is this CLIP-subtree leaf trainable? path_parts: tuple of str keys."""
    p = path_parts
    if "adapter" in p:
        return True
    if p[:2] == ("visual", "positional_embedding"):
        return True
    if len(p) >= 2 and p[0] == "visual" and p[1] in ("ln_post", "proj"):
        return True
    return False


def _path_parts(path):
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(k.key)
        elif hasattr(k, "idx"):
            out.append(k.idx)
        else:
            out.append(str(k))
    return tuple(out)


def trainable_predicate(path) -> bool:
    """Full-model predicate over params trees produced by init_upt_params:
    everything trains except the frozen parts of the CLIP subtree."""
    parts = _path_parts(path)
    if parts and parts[0] == "clip":
        inner = tuple(p for p in parts[1:] if isinstance(p, str))
        return clip_trainable(inner)
    return True


def lr_group(path) -> str:
    """'vit' for CLIP-subtree params, 'head' otherwise (:988-999)."""
    parts = _path_parts(path)
    return "vit" if parts and parts[0] == "clip" else "head"


def split_params(params, predicate=trainable_predicate):
    """-> (trainable, frozen): same treedef, None where not selected."""
    train = jax.tree_util.tree_map_with_path(
        lambda path, x: x if predicate(path) else None, params)
    frozen = jax.tree_util.tree_map_with_path(
        lambda path, x: None if predicate(path) else x, params)
    return train, frozen


def merge_params(trainable, frozen):
    return jax.tree.map(lambda a, b: b if a is None else a,
                        trainable, frozen,
                        is_leaf=lambda x: x is None)


def label_tree(params, fn):
    """Map every leaf to a string label (for optax.multi_transform)."""
    return jax.tree_util.tree_map_with_path(lambda path, x: fn(path), params)
