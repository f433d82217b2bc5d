"""Fused Tip-Adapter cache scoring as a Pallas TPU kernel.

The cache branch computes logits = ((X @ W^T + b) @ L) / s
(upt...py:1156-1170) — two chained matmuls whose (N, R) affinity
intermediate XLA materializes in HBM between them. This kernel keeps the
affinity tile in VMEM: one grid step loads an X row-tile, runs both MXU
contractions back to back, and writes only the (tile, C) logits.

Shapes (flagship): X (B*450, 512|1024), W (1200, D), L (1200, 600),
s (600,): W+L ≈ 5.3 MB — comfortably VMEM-resident across the whole grid.

A custom VJP recomputes the backward with plain einsums (the branch is
trained: W and b are parameters, L and s are frozen buffers).

Measured on v5e at batch-16 eval shapes (N=7200, R=1200, C=600): with
bf16 MXU inputs (f32 accumulation) this kernel runs 324us vs 1534us for
the unfused XLA pair — 4.7x — with an identical reduction sum. Enabled in
the flagship eval path via UPTConfig.use_pallas_cache.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _pinned_precision(dtype):
    """Dot precision pinned inside the kernel so ambient
    jax.default_matmul_precision contexts cannot change (or break) the
    kernel's math.  Two measured failure modes on v5e (round 5):
    an ambient "highest" forces an fp32 contract onto bf16 MXU operands,
    which Mosaic rejects ("Bad lhs type"); and a pinned HIGHEST with f32
    operands compiles but WEDGES the device (the kernel returns, then the
    next device op hangs forever).  DEFAULT is the only contract proven
    safe for every operand dtype here: one MXU pass, f32 accumulation via
    preferred_element_type."""
    del dtype
    return jax.lax.Precision.DEFAULT


def _kernel(x_ref, w_ref, b_ref, l_ref, s_ref, out_ref):
    prec = _pinned_precision(x_ref.dtype)
    phi = jnp.dot(x_ref[:], w_ref[:].T, preferred_element_type=jnp.float32,
                  precision=prec)
    phi = phi + b_ref[:]
    logits = jnp.dot(phi.astype(l_ref.dtype), l_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=_pinned_precision(l_ref.dtype))
    out_ref[:] = logits / s_ref[:]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fused_forward(x, w, b, l, s, interpret=False, compute_dtype=jnp.float32):
    """compute_dtype: MXU input dtype (bf16 halves VMEM/HBM traffic;
    accumulation stays f32 via preferred_element_type)."""
    n, d = x.shape
    r, c = l.shape
    n_pad = _round_up(max(n, 8), TILE_N)
    x_p = jnp.pad(x, ((0, n_pad - n), (0, 0))).astype(compute_dtype)
    grid = (n_pad // TILE_N,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        interpret=interpret,
    )(x_p, w.astype(compute_dtype), b.reshape(1, -1).astype(jnp.float32),
      l.astype(compute_dtype), s.reshape(1, -1).astype(jnp.float32))
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_cache_logits(x, w, b, l, s, interpret=False,
                       compute_dtype=jnp.float32):
    """((x @ w.T + b) @ l) / s with the intermediate fused in VMEM.

    x: (..., N, D); w: (R, D); b: (R,); l: (R, C); s: (C,).
    compute_dtype=bfloat16 halves MXU-input traffic (accumulation stays
    f32). Gradients flow to x, w, b (l and s are frozen buffers).
    """
    lead = x.shape[:-1]
    out = _fused_forward(x.reshape(-1, x.shape[-1]), w, b, l, s, interpret,
                         compute_dtype)
    return out.reshape(*lead, l.shape[1])


def _fwd(x, w, b, l, s, interpret=False, compute_dtype=jnp.float32):
    return fused_cache_logits(x, w, b, l, s, interpret, compute_dtype), \
        (x, w, b, l, s)


def _bwd(interpret, compute_dtype, res, g):
    x, w, b, l, s = res
    gs = g / s                                   # (..., N, C)
    g_phi = jnp.einsum("...nc,rc->...nr", gs, l)
    dx = jnp.einsum("...nr,rd->...nd", g_phi, w).astype(x.dtype)
    flat_gphi = g_phi.reshape(-1, w.shape[0])
    flat_x = x.reshape(-1, x.shape[-1])
    dw = jnp.einsum("nr,nd->rd", flat_gphi, flat_x).astype(w.dtype)
    db = flat_gphi.sum(0).astype(b.dtype)
    return dx, dw, db, jnp.zeros_like(l), jnp.zeros_like(s)


fused_cache_logits.defvjp(_fwd, _bwd)


def cache_logits_reference(x, w, b, l, s):
    """Plain-XLA reference (identical math, unfused)."""
    return ((x @ w.T + b) @ l) / s
