"""Fused ResNet bottleneck-chain Pallas kernel (NHWC, inference).

The frozen R50 tower is HBM-bandwidth bound (STATUS round-2 budget: ~40ms
of the 58ms eval step at batch 16 / 800x1344 bf16, vs a ~26ms roofline):
XLA materializes every bottleneck's wide (4M-channel) activation to HBM,
so each residual block costs ~3 full passes over the big tensor (conv1
read, identity read, out write). This kernel runs a CHAIN of K stride-1,
no-downsample bottlenecks (the tail blocks of each residual layer —
torchvision resnet50 layout, /root/reference/detr/models/backbone.py:83)
over row-tiles held in VMEM: the wide tensor is read once (+halo) and
written once per chain, mid (M-channel) activations never leave VMEM.

Math per block (identical to models/detr/resnet.py::_bottleneck, frozen
BN pre-folded into scale/bias):
    m1 = relu(x @ w1 * s1 + b1)                 # 1x1, C -> M
    m2 = relu(conv3x3(m1) * s2 + b2)            # SAME, M -> M
    out = relu(m2 @ w3 * s3 + b3 + x)           # 1x1, M -> C

The 3x3 is computed as 9 statically-shifted flat GEMMs over a W-padded
row buffer: with row stride Wp = W + 2 and zero pad columns, tap (dy, dx)
of every output pixel lives at flat offset dy*Wp + dx — junk from row
wrap lands only in the discarded pad columns. Row halos across tiles come
from overlapping HBM DMA windows (clamped at the image edge, with the
out-of-image rows masked to zero in VMEM), double-buffered across grid
steps.
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pinned_precision(dtype):
    """Pin dot precision inside the kernel so ambient
    jax.default_matmul_precision contexts cannot force an illegal fp32
    contract onto bf16 MXU operands (Mosaic "Bad lhs type"); pinned
    HIGHEST with f32 operands wedges the device (see ops/pallas_cache.py),
    so DEFAULT is the only safe contract for every operand dtype."""
    del dtype
    return jax.lax.Precision.DEFAULT


def _chain_kernel(x_hbm, w1, s1, b1, w2, s2, b2, w3, s3, b3, out_ref,
                  xwin, sem, *, K, R, H, W, C, M, Hpad):
    """Grid (B, nh). xwin: (2, R + 2K, W, C) double-buffered input scratch.

    Weight refs (VMEM, whole): w1 (K, C, M), w2 (K, 9, M, M),
    w3 (K, M, C); scales/biases (K, M) / (K, C).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    win = R + 2 * K

    def start_dma(slot, bb, ii):
        desired = ii * R - K
        actual = jnp.clip(desired, 0, Hpad - win)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(actual, win)], xwin.at[slot],
            sem.at[slot])

    step = b * nh + i
    slot = step % 2
    nslot = (step + 1) % 2

    @pl.when(step == 0)
    def _():
        start_dma(0, b, i).start()

    # prefetch the next grid step's window
    @pl.when(step + 1 < pl.num_programs(0) * nh)
    def _():
        nb = jax.lax.select(i + 1 < nh, b, b + 1)
        ni = (i + 1) % nh
        start_dma(nslot, nb, ni).start()

    start_dma(slot, b, i).wait()

    desired = i * R - K
    actual = jnp.clip(desired, 0, Hpad - win)
    shift = desired - actual          # in [-K, 0] (top) or [0, K] (bottom)

    # virtual window rows j = image rows desired + j; vmem holds
    # actual + j. W[j] = vmem[j + shift] — a circular roll by -shift whose
    # wrapped rows land exactly on out-of-image rows, which the validity
    # mask zeroes (they are the conv's SAME padding).
    # dynamic_rotate requires 32-bit data (bitcast bf16 lanes to i32 pairs;
    # axis-0 rotation is unaffected by minor-dim packing) and a
    # NON-NEGATIVE rotate amount (a negative amount wraps to garbage)
    amt = (-shift + win) % win
    xv = pltpu.bitcast(
        pltpu.roll(pltpu.bitcast(xwin[slot], jnp.int32), amt, axis=0),
        xwin.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (win, 1, 1), 0)
    valid = (rows + desired >= 0) & (rows + desired < H)
    x = jnp.where(valid, xv, 0)

    for k in range(K):
        r = R + 2 * (K - k)           # input rows for this block
        ro = r - 2                    # output rows
        xk = x[:r]
        # conv1 (1x1): (r*W, C) @ (C, M)
        m1 = jax.lax.dot_general(
            xk.reshape(r * W, C), w1[k],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_pinned_precision(xk.dtype))
        m1 = jnp.maximum(m1 * s1[k] + b1[k], 0.0).astype(xk.dtype)
        m1 = m1.reshape(r, W, M)
        # out-of-image rows are conv2's SAME zero padding — the conv1 bias
        # must not activate them (m1 row j = image row desired + k + j)
        rr = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
        m1 = jnp.where((rr + desired + k >= 0) & (rr + desired + k < H),
                       m1, 0)
        # conv2 (3x3 SAME) as ONE im2col GEMM: 3 pre-shifted W-buffers
        # (2 lane-shift copies), then the 9 taps' row slices (free on the
        # untiled major dim) concatenated on the channel axis ->
        # (ro*W, 9M) @ (9M, M). One wide-contraction MXU pass replaces 9
        # narrow K=M GEMMs + 8 f32 accumulator read-modify-writes, which
        # dominated the per-tile cost in the 9-GEMM form.
        z = jnp.zeros((r, 1, M), m1.dtype)
        shifts = [
            jnp.concatenate([z, m1[:, :-1]], axis=1),   # d = -1
            m1,                                         # d = 0
            jnp.concatenate([m1[:, 1:], z], axis=1),    # d = +1
        ]
        patches = jnp.concatenate(
            [shifts[dx][dy:dy + ro] for dy in range(3) for dx in range(3)],
            axis=-1).reshape(ro * W, 9 * M)
        acc = jax.lax.dot_general(
            patches, w2[k].reshape(9 * M, M),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_pinned_precision(patches.dtype))
        m2 = jnp.maximum(acc * s2[k] + b2[k], 0.0).astype(xk.dtype)
        # conv3 (1x1) + residual + relu
        y = jax.lax.dot_general(
            m2, w3[k],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_pinned_precision(m2.dtype))
        y = y * s3[k] + b3[k]
        y = y.reshape(ro, W, C) + x[1:1 + ro].astype(jnp.float32)
        x = jnp.maximum(y, 0.0).astype(xk.dtype)
        # rows outside the image must stay ZERO entering the next block's
        # 3x3 (they are its SAME padding) — without this the conv biases
        # leak nonzero values into the halo rows
        if k + 1 < K:
            base = desired + (k + 1)          # image row of x[0]
            rr = jax.lax.broadcasted_iota(jnp.int32, (ro, 1, 1), 0)
            x = jnp.where((rr + base >= 0) & (rr + base < H), x, 0)

    # valid output rows for edge tiles (last tile may exceed H)
    out_ref[0] = x[:R]


def _shift_rows(v, sh):
    """W[j] = v[j + sh] with zero fill (static sh)."""
    if sh == 0:
        return v
    z = jnp.zeros((abs(sh),) + v.shape[1:], v.dtype)
    if sh > 0:
        return jnp.concatenate([v[sh:], z], axis=0)
    return jnp.concatenate([z, v[:sh]], axis=0)


def fused_bottleneck_chain(x, blocks, row_tile: int = 8,
                           interpret: bool = False):
    """x: (B, H, W, C) NHWC; blocks: list of K frozen-BN bottleneck param
    dicts (conv1/conv2/conv3 with OIHW 'w' + folded 'scale'/'bias'),
    stride 1, no downsample. Returns the chained bottleneck output,
    bit-comparable to running models/detr/resnet.py::_bottleneck K times.
    """
    B, H, W, C = x.shape
    K = len(blocks)
    M = blocks[0]["conv1"]["w"].shape[0]
    dt = x.dtype

    def prep(bp):
        # OIHW -> matmul layouts
        w1 = jnp.transpose(bp["conv1"]["w"][:, :, 0, 0], (1, 0))    # (C, M)
        w2 = jnp.transpose(bp["conv2"]["w"], (2, 3, 1, 0))          # 3,3,M,M
        w2 = w2.reshape(9, M, M)
        w3 = jnp.transpose(bp["conv3"]["w"][:, :, 0, 0], (1, 0))    # (M, C)
        return (w1.astype(dt), bp["conv1"]["scale"].astype(jnp.float32),
                bp["conv1"]["bias"].astype(jnp.float32),
                w2.astype(dt), bp["conv2"]["scale"].astype(jnp.float32),
                bp["conv2"]["bias"].astype(jnp.float32),
                w3.astype(dt), bp["conv3"]["scale"].astype(jnp.float32),
                bp["conv3"]["bias"].astype(jnp.float32))

    packed = [jnp.stack(t) for t in zip(*(prep(bp) for bp in blocks))]

    R = row_tile
    nh = -(-H // R)
    # the DMA window (R + 2K rows) must fit inside the padded image; tiny
    # planes (deep layers of small test images) pad up to one window
    Hpad = max(nh * R, R + 2 * K)
    if Hpad != H:
        # pad rows so every tile is full; padded rows are masked to zero in
        # the kernel's valid-row logic only for the *input* halo — output
        # rows beyond H are sliced off below
        x = jnp.pad(x, ((0, 0), (0, Hpad - H), (0, 0), (0, 0)))

    kern = functools.partial(_chain_kernel, K=K, R=R, H=H, W=W, C=C, M=M,
                             Hpad=Hpad)
    vspec = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
    out = pl.pallas_call(
        kern,
        grid=(B, nh),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + vspec,
        out_specs=pl.BlockSpec((1, R, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hpad, W, C), dt),
        scratch_shapes=[
            pltpu.VMEM((2, R + 2 * K, W, C), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, *packed)
    return out[:, :H]
