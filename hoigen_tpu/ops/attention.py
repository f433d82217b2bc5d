"""Fused multi-head attention (Pallas, TPU).

The DETR encoder runs self-attention over ~1050 tokens x 8 heads x 32-dim
heads. Under plain XLA the score tensor (B, H, L, L) materializes in HBM —
at B=16 that is ~0.5GB written+read per encoder layer, and the measured
encoder cost is pure HBM bandwidth (reference architecture:
/root/reference/detr/models/transformer.py:157-190; torch has the same
materialization in nn.MultiheadAttention).

This kernel keeps one batch element's K/V for ALL heads resident in VMEM
and computes scores -> softmax -> @V per (q-block, head) without writing
scores to HBM. Blocking over all heads at once matters on TPU: a
per-(batch, head) block of shape (L, 32) makes every DMA a 64-byte strip
(the 32-wide minor dim), and descriptor overhead made a first version of
this kernel 8x SLOWER than XLA. With (1, H, L, D) blocks the DMAs are
contiguous (H*L*D elements) and the kernel beats XLA's fusion.

Non-TPU backends fall back to the identical XLA math (same function
signature), so CPU tests exercise the same call sites.
"""
import functools
import math

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, sm_scale, nheads):
    bias = bias_ref[0]                        # (1, L) additive f32
    for h in range(nheads):                   # unrolled; heads share the DMA
        q = q_ref[0, h]                       # (Q_BLK, D)
        k = k_ref[0, h]                       # (L, D)
        v = v_ref[0, h]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        # reciprocal-multiply: one divide per ROW instead of per element
        # (the (Q_BLK, L) elementwise divide was measurable VPU time)
        p = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))).astype(v.dtype)
        o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _xla_attention(q, k, v, key_bias, sm_scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    if key_bias is not None:
        s = s + key_bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def fused_attention(q, k, v, key_bias=None, sm_scale=None,
                    use_pallas=None, interpret=False, q_blk=384):
    """q: (B, H, Lq, D); k, v: (B, H, Lk, D) (self- or cross-attention);
    key_bias: optional (B, Lk) additive f32 (use -1e9 for padded keys).
    Returns (B, H, Lq, D) in q.dtype.

    Inference-only (no VJP defined): the HOI pipeline runs DETR frozen
    under stop_gradient; the offline DETR finetune keeps the XLA path.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not (use_pallas or interpret):
        return _xla_attention(q, k, v, key_bias, sm_scale)

    b, h, lq, d = q.shape
    lk = k.shape[2]
    # scale the q-block down as Lk grows: the (Q_BLK, Lk) f32 score/exp
    # transients live on the 16MB scoped-VMEM stack, and the proven budget
    # is 384x1152 (the 800x1344 bucket); bigger buckets (e.g. 1333x1333 ->
    # Lk 1792) OOM at q_blk 384
    q_blk = min(q_blk, max(128, (384 * 1152 // max(lk, 1)) // 128 * 128))
    q_blk = min(q_blk, -(-lq // 128) * 128)
    lqp = -(-lq // q_blk) * q_blk                    # pad to block multiple
    lkp = -(-lk // 128) * 128
    qp = jnp.pad(q, [(0, 0), (0, 0), (0, lqp - lq), (0, 0)])
    kp, vp = (jnp.pad(x, [(0, 0), (0, 0), (0, lkp - lk), (0, 0)])
              for x in (k, v))
    bias = jnp.zeros((b, lk), jnp.float32) if key_bias is None \
        else key_bias.astype(jnp.float32)
    # (B, 1, Lkp): a singleton middle axis keeps the block tile-legal
    bias = jnp.pad(bias, [(0, 0), (0, lkp - lk)],
                   constant_values=-1e9)[:, None, :]

    grid = (b, lqp // q_blk)
    # K/V blocks span all heads of one batch element: contiguous DMA, and
    # the index map is j-independent so the block stays in VMEM across the
    # q-block sweep.
    kv_spec = pl.BlockSpec((1, h, lkp, d), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, sm_scale=sm_scale, nheads=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, q_blk, d),
                         lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, kv_spec,
            pl.BlockSpec((1, 1, lkp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, q_blk, d),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, lqp, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bias)
    return out[:, :, :lq, :]
