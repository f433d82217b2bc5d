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


def _pinned_precision(dtype):
    """Dot precision pinned inside the kernel so ambient
    jax.default_matmul_precision contexts cannot change (or break) the
    kernel's math (see ops/pallas_cache.py for the two measured failure
    modes: Mosaic "Bad lhs type" on bf16 + ambient-highest, and a device
    wedge on f32 + pinned HIGHEST).  DEFAULT is the only contract proven
    safe for every operand dtype on this chip."""
    del dtype
    return jax.lax.Precision.DEFAULT


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_pinned_precision(a.dtype))


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, sm_scale, nheads):
    bias = bias_ref[0]                        # (1, L) additive f32
    for h in range(nheads):                   # unrolled; heads share the DMA
        q = q_ref[0, h]                       # (Q_BLK, D)
        k = k_ref[0, h]                       # (L, D)
        v = v_ref[0, h]
        s = _dot(q, k, ((1,), (1,)))
        s = s * sm_scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        # reciprocal-multiply: one divide per ROW instead of per element
        # (the (Q_BLK, L) elementwise divide was measurable VPU time)
        p = (e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))).astype(v.dtype)
        o = _dot(p, v, ((1,), (0,)))
        o_ref[0, h] = o.astype(o_ref.dtype)


def _xla_attention(q, k, v, key_bias, sm_scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    if key_bias is not None:
        s = s + key_bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _budget_elems(h, d, itemsize):
    """Scoped-VMEM q-block budget in (q_blk * lk) elements.

    The proven anchor is 384x1152 measured on the DETR encoder (H=8,
    D=32, bf16). Both the whole-heads blocks (q_blk*H*D*itemsize) and the
    UNROLLED per-head (q_blk, lk) f32 transients scale the stack, so the
    budget shrinks with H, D and itemsize. The CLIP train tower (H=12,
    D=64, f32 — images_clip is f32) blew the 25M scoped limit at 27M with
    the unscaled budget (measured round 5); scaled, its backward picks
    q_blk=128 and fits."""
    return 384 * 1152 * (8 * 32 * 2) // (h * d * itemsize)


def _bwd_q_blk(lk, q_blk, h, d, itemsize):
    # the backward holds ~4 (Q_BLK, Lk) f32 transients (s/e, p, dp, ds)
    # plus the f32 dk/dv accumulators — half the forward's q-block budget
    q_blk = min(q_blk,
                max(128, (_budget_elems(h, d, itemsize) // 2
                          // max(lk, 1)) // 128 * 128))
    return q_blk


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, o_ref,
                     dq_ref, dk_ref, dv_ref, db_ref, *, sm_scale, nheads):
    """Flash-style recompute backward. Per (batch, q-block) grid step:
    recompute the block's softmax (no lse saved — one extra max/sum
    reduction instead of an extra HBM-resident stat), then
      dv += p^T dO;  dp = dO v^T;  ds = p*(dp - rowsum(dO*O));
      dq = ds k * scale;  dk += ds^T q * scale;  db += sum_q ds.
    dk/dv/db accumulate in VMEM across the q-block sweep (their index maps
    are j-independent, so the blocks stay resident; j==0 zero-initializes).
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    bias = bias_ref[0]                        # (1, Lk)
    for h in range(nheads):
        q = q_ref[0, h]                       # (Q_BLK, D)
        k = k_ref[0, h]                       # (Lk, D)
        v = v_ref[0, h]
        do = do_ref[0, h]                     # (Q_BLK, D)
        o = o_ref[0, h]
        s = _dot(q, k, ((1,), (1,)))
        s = s * sm_scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))   # f32 (Qb, Lk)
        pc = p.astype(v.dtype)
        dv_ref[0, h] += _dot(pc, do, ((0,), (0,)))
        dp = _dot(do, v, ((1,), (1,)))
        delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                        axis=-1, keepdims=True)               # (Qb, 1)
        ds = p * (dp - delta)                                 # f32
        db_ref[0, 0] += jnp.sum(ds, axis=0)
        dsc = (ds * sm_scale).astype(q.dtype)
        dq_ref[0, h] = _dot(dsc, k, ((1,), (0,))).astype(dq_ref.dtype)
        dk_ref[0, h] += _dot(dsc, q, ((0,), (0,)))


def _pallas_attention(q, k, v, bias, sm_scale, interpret, q_blk):
    """Forward Pallas path. bias: (B, Lk) f32 (zeros when unused)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    # scale the q-block down as Lk grows: the (Q_BLK, Lk) f32 score/exp
    # transients live on the 16MB scoped-VMEM stack, and the proven budget
    # is 384x1152 (the 800x1344 bucket); bigger buckets (e.g. 1333x1333 ->
    # Lk 1792) OOM at q_blk 384
    q_blk = min(q_blk, max(128, (_budget_elems(h, d, q.dtype.itemsize)
                                 // max(lk, 1)) // 128 * 128))
    q_blk = min(q_blk, -(-lq // 128) * 128)
    lqp = -(-lq // q_blk) * q_blk                    # pad to block multiple
    lkp = -(-lk // 128) * 128
    qp = jnp.pad(q, [(0, 0), (0, 0), (0, lqp - lq), (0, 0)])
    kp, vp = (jnp.pad(x, [(0, 0), (0, 0), (0, lkp - lk), (0, 0)])
              for x in (k, v))
    # (B, 1, Lkp): a singleton middle axis keeps the block tile-legal
    bias = jnp.pad(bias.astype(jnp.float32), [(0, 0), (0, lkp - lk)],
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


def _pallas_attention_bwd(q, k, v, bias, out, g, sm_scale, interpret,
                          q_blk):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    q_blk = _bwd_q_blk(lk, q_blk, h, d, q.dtype.itemsize)
    q_blk = min(q_blk, -(-lq // 128) * 128)
    lqp = -(-lq // q_blk) * q_blk
    lkp = -(-lk // 128) * 128
    qp, op, gp = (jnp.pad(x, [(0, 0), (0, 0), (0, lqp - lq), (0, 0)])
                  for x in (q, out, g))
    kp, vp = (jnp.pad(x, [(0, 0), (0, 0), (0, lkp - lk), (0, 0)])
              for x in (k, v))
    biasp = jnp.pad(bias.astype(jnp.float32), [(0, 0), (0, lkp - lk)],
                    constant_values=-1e9)[:, None, :]

    grid = (b, lqp // q_blk)
    q_spec = pl.BlockSpec((1, h, q_blk, d), lambda i, j: (i, 0, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, h, lkp, d), lambda i, j: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, sm_scale=sm_scale, nheads=h),
        grid=grid,
        in_specs=[
            q_spec, kv_spec, kv_spec,
            pl.BlockSpec((1, 1, lkp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            q_spec, q_spec,
        ],
        out_specs=[
            q_spec,
            kv_spec, kv_spec,
            pl.BlockSpec((1, 1, lkp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, lqp, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, lkp, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, lkp, d), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, lkp), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, biasp, gp, op)
    return (dq[:, :, :lq, :], dk[:, :, :lk, :].astype(k.dtype),
            dv[:, :, :lk, :].astype(v.dtype),
            db[:, 0, :lk].astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _attention_ad(q, k, v, bias, sm_scale, interpret, q_blk):
    return _pallas_attention(q, k, v, bias, sm_scale, interpret, q_blk)


def _attention_ad_fwd(q, k, v, bias, sm_scale, interpret, q_blk):
    out = _pallas_attention(q, k, v, bias, sm_scale, interpret, q_blk)
    return out, (q, k, v, bias, out)


def _attention_ad_bwd(sm_scale, interpret, q_blk, res, g):
    q, k, v, bias, out = res
    return _pallas_attention_bwd(q, k, v, bias, out, g, sm_scale,
                                 interpret, q_blk)


_attention_ad.defvjp(_attention_ad_fwd, _attention_ad_bwd)


def fused_attention(q, k, v, key_bias=None, sm_scale=None,
                    use_pallas=None, interpret=False, q_blk=384):
    """q: (B, H, Lq, D); k, v: (B, H, Lk, D) (self- or cross-attention);
    key_bias: optional (B, Lk) additive f32 (use -1e9 for padded keys).
    Returns (B, H, Lq, D) in q.dtype.

    Differentiable: a flash-style recompute backward (Pallas) provides
    dq/dk/dv/dbias, so trained towers (CLIP ViT adapters path) can run the
    fused kernel too — not just the frozen/stop_gradient DETR encoder.
    """
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not (use_pallas or interpret):
        return _xla_attention(q, k, v, key_bias, sm_scale)
    b, lk = q.shape[0], k.shape[2]
    bias = jnp.zeros((b, lk), jnp.float32) if key_bias is None \
        else key_bias.astype(jnp.float32)
    return _attention_ad(q, k, v, bias, sm_scale, interpret, q_blk)
