"""Fused anchored (Δ-UQ / PAGER) evaluation kernel.

The anchored UE pass (reference ``nnueehcs/models.py:313-341`` driving the
external LLNL ``deltauq`` package) evaluates the net on
``concat([anchor, x - anchor])`` for each of k anchors and reduces
mean/std over the anchor axis.  The generic path vmaps the net over the
anchor axis, materialising (group, B, 2d) anchored inputs and re-reading
activations from HBM every layer; at the flagship scale (33.4M rows ×
hundreds of anchors × 45 timed passes per trial) that anchored eval *is*
the experiment's cost driver (~8-30 h per BO cell).

This kernel removes both the anchored-input materialisation and the HBM
round-trips with two observations:

1. the first Linear of an anchored forward decomposes exactly:
   ``concat([a, x-a]) @ W = x @ W_bot + a @ (W_top - W_bot)``, so the
   per-anchor work in layer 0 collapses to adding a precomputed
   per-anchor row ``v_j = a_j @ (W_top - W_bot)`` (k×128 — computed once
   per pass) onto a shared ``u = x @ W_bot + b`` (computed once per
   batch tile).  No (k, B, 2d) anchored input ever exists.
2. the whole folded weight chain (eval-mode BatchNorm folded into the
   Linears, as in :mod:`.fused_ensemble`) fits in VMEM, so the anchor
   loop runs on-chip per batch tile with *shifted* mean/std accumulation
   (the same catastrophic-cancellation-safe scheme as the ensemble
   kernel).

The r2 negative result ("a fused anchored kernel measured slower than
the vmap path", see fused_ensemble.py) predates both observations: that
prototype still gathered anchored inputs per anchor.

Engages through ``DeltaUQMLP.__call__`` on TPU (stateful eval only — the
folded weights bake the parameter version, so traced training/validation
passes keep the vmap path); every unfusable case falls back.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fused_ensemble import (_fold_linear_chain, _round_up, _shifted_stats,
                             _VMEM_BUDGET)


def _plan_rows(b_rows):
    if b_rows % 512 == 0:
        return b_rows, 512
    if b_rows % 256 == 0:
        return b_rows, 256
    return _round_up(b_rows, 256), 256


class AnchoredCache:
    """Pre-folded, pre-padded weights for the anchored kernel, pinned to
    the params/state pytree objects they were derived from."""

    def __init__(self, folded, src_params, src_state=None, *, w0x=None,
                 w0d=None, b0=None, ws=None, bs=None, relus=None,
                 relu0=False, out_dim=1, dpad=128, in_dim=0,
                 compute_dtype='float32'):
        self.folded = folded
        self.src_params = src_params
        self.src_state = src_state
        self.w0x = w0x          # (dpad, 128) x-part of the first Linear
        self.w0d = w0d          # (in_dim, 128) f32: W_top - W_bot
        self.b0 = b0            # (128,) f32 folded first-layer bias
        self.ws = ws            # hidden+out Linear weights, (128, 128) each
        self.bs = bs            # (128,) f32 biases
        self.relus = relus      # relu flags for ws layers
        self.relu0 = relu0
        self.out_dim = out_dim
        self.dpad = dpad
        self.in_dim = in_dim
        self.compute_dtype = compute_dtype

    def stale_for(self, params, state) -> bool:
        return self.src_params is not params or self.src_state is not state


def prepare_fused_anchored(net, params, state) -> AnchoredCache:
    """Fold + split + pad once per parameter/state version (host side).

    The net's first Linear must take ``2 * in_dim`` features (the
    anchored-input contract); hidden/output widths must fit one 128-lane
    block.  Returns a cache with ``folded=False`` when not fusable."""
    result = _fold_linear_chain(net, params, state, allow_dropout=False)
    if result is None:
        return AnchoredCache(False, params, state)
    folded, _ = result
    if len(folded) < 2:
        return AnchoredCache(False, params, state)
    w0, b0, relu0 = folded[0]
    two_d, width0 = int(w0.shape[-2]), int(w0.shape[-1])
    if two_d % 2 or width0 > 128:
        return AnchoredCache(False, params, state)
    d = two_d // 2
    for idx, (w, _, _) in enumerate(folded[1:]):
        if w.shape[-1] > 128 or w.shape[-2] > 128:
            return AnchoredCache(False, params, state)
    out_dim = int(folded[-1][0].shape[-1])

    cdt = jnp.dtype(getattr(net, 'compute_dtype', None) or jnp.float32)
    dpad = _round_up(d, 128)
    # anchored_input = concat([anchor, x - anchor]):
    #   h0 = a @ W_top + (x - a) @ W_bot + b = x @ W_bot + a @ (W_top - W_bot) + b
    w_top, w_bot = w0[:d], w0[d:]
    w0x = jnp.zeros((dpad, 128), cdt).at[:d, :width0].set(w_bot.astype(cdt))
    w0d = (w_top - w_bot).astype(jnp.float32)          # (d, width0) tiny
    b0p = jnp.zeros((128,), jnp.float32).at[:width0].set(
        b0.astype(jnp.float32))

    ws, bs, relus = [], [], []
    for w, b, relu in folded[1:]:
        in_pad = _round_up(int(w.shape[-2]), 128)
        if in_pad != 128:
            return AnchoredCache(False, params, state)
        w_p = jnp.zeros((128, 128), cdt).at[:w.shape[-2], :w.shape[-1]].set(
            w.astype(cdt))
        b_p = jnp.zeros((128,), jnp.float32).at[:b.shape[-1]].set(
            b.astype(jnp.float32))
        ws.append(jax.device_put(w_p))
        bs.append(jax.device_put(b_p))
        relus.append(relu)

    weight_bytes = (int(np.prod(w0x.shape)) * w0x.dtype.itemsize
                    + sum(int(np.prod(w.shape)) * w.dtype.itemsize
                          for w in ws))
    if weight_bytes > _VMEM_BUDGET // 2:
        return AnchoredCache(False, params, state)

    return AnchoredCache(True, params, state,
                         w0x=jax.device_put(w0x), w0d=jax.device_put(w0d),
                         b0=jax.device_put(b0p), ws=tuple(ws),
                         bs=tuple(bs), relus=tuple(relus), relu0=relu0,
                         out_dim=out_dim, dpad=dpad, in_dim=d,
                         compute_dtype=cdt.name)


def _anchored_kernel(x_ref, w0_ref, b0_ref, v_ref, *refs, num_layers,
                     relus, relu0, compute_dtype='float32'):
    """Grid = (batch tiles, anchors): the anchor loop rides the SECOND
    grid dimension (sequential on TPU, anchors innermost), with the
    shared layer-0 ``u``, the shift reference ``c`` and the running
    shifted sums living in scratch across anchor steps.  Dynamic VMEM
    row indexing (``dynamic_slice``) is not lowerable in Pallas TPU
    kernels — the per-anchor ``v`` row arrives as a (1, 128) grid block
    via its BlockSpec index map instead."""
    from jax.experimental import pallas as pl

    w_refs = refs[:num_layers]
    b_refs = refs[num_layers:2 * num_layers]
    mean_ref, std_ref = refs[2 * num_layers:2 * num_layers + 2]
    u_scr, c_scr, s1_scr, s2_scr = refs[2 * num_layers + 2:]

    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    cdt = jnp.dtype(compute_dtype)

    @pl.when(j == 0)
    def _():
        # shared x-part of layer 0 — ONE GEMM per batch tile, reused by
        # every anchor step
        x = x_ref[:].astype(cdt)                      # (TILE, dpad)
        u_scr[:] = jnp.dot(x, w0_ref[:],
                           preferred_element_type=jnp.float32) + b0_ref[:]
        s1_scr[:] = jnp.zeros_like(s1_scr)
        s2_scr[:] = jnp.zeros_like(s2_scr)

    h = u_scr[:] + v_ref[:].reshape(1, 128)           # (TILE, 128) f32
    if relu0:
        h = jnp.maximum(h, 0.0)
    for l in range(num_layers):
        h = jnp.dot(h.astype(cdt), w_refs[l][:],
                    preferred_element_type=jnp.float32)
        h = h + b_refs[l][:]
        if relus[l]:
            h = jnp.maximum(h, 0.0)

    @pl.when(j == 0)
    def _():
        c_scr[:] = h

    @pl.when(j > 0)
    def _():
        d = h - c_scr[:]
        s1_scr[:] = s1_scr[:] + d
        s2_scr[:] = s2_scr[:] + d * d

    @pl.when(j == n_j - 1)
    def _():
        mean, std = _shifted_stats(s1_scr[:], s2_scr[:], c_scr[:], n_j)
        mean_ref[:] = mean
        std_ref[:] = std


@functools.partial(jax.jit, static_argnames=('num_anchors', 'relus',
                                             'relu0', 'out_dim', 'tile',
                                             'compute_dtype'))
def _anchored_forward(x_pad, w0x, b0, v_pad, ws, bs, num_anchors, relus,
                      relu0, out_dim, tile, compute_dtype='float32'):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bpad, dpad = x_pad.shape
    num_layers = len(ws)
    # anchors ride the second (innermost, sequential) grid dimension;
    # scratch carries u/c/s1/s2 across anchor steps within a batch tile
    grid = (bpad // tile, num_anchors)

    in_specs = [
        pl.BlockSpec((tile, dpad), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w0x.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(b0.shape, lambda i, j: (0,),
                     memory_space=pltpu.VMEM),
        # one anchor row per anchor grid step; the (1, 1, 128) block keeps
        # the last two dims equal to the array's (TPU sublane constraint
        # forbids a bare (1, 128) block of a (k, 128) array)
        pl.BlockSpec((1, 1, 128), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i, j: (0,),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _anchored_kernel, num_layers=num_layers,
        relus=relus, relu0=relu0, compute_dtype=compute_dtype)

    mean, std = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((tile, 128), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile, 128), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((bpad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((bpad, 128), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((tile, 128), jnp.float32),   # u
            pltpu.VMEM((tile, 128), jnp.float32),   # c (shift reference)
            pltpu.VMEM((tile, 128), jnp.float32),   # s1
            pltpu.VMEM((tile, 128), jnp.float32),   # s2
        ],
    )(x_pad, w0x, b0, v_pad, *ws, *bs)
    return mean[:, :out_dim], std[:, :out_dim]


def fused_anchored_stats(cache: AnchoredCache, x, anchors, n_anchors: int):
    """(mean, std) over ``n_anchors`` anchored passes with all weights
    VMEM-resident and the anchor loop on-chip.  Traceable (called inside
    the model's jitted eval; ``anchors`` may be a traced buffer).  The
    anchor-axis statistics use the shifted one-pass scheme — parity with
    the vmap path's Chan combine is float32-roundoff (~1e-5 relative)."""
    a = anchors[:n_anchors]
    k = int(a.shape[0])
    # per-anchor layer-0 rows: v_j = a_j @ (W_top - W_bot)  — tiny GEMM,
    # full f32 (anchor offsets feed every downstream layer)
    v = jnp.dot(a.astype(jnp.float32), cache.w0d,
                precision='highest')                    # (k, width0)
    v_pad = jnp.zeros((k, 1, 128), jnp.float32)
    v_pad = v_pad.at[:, 0, :v.shape[1]].set(v)

    b = x.shape[0]
    bpad, tile = _plan_rows(max(b, 1))
    x_p = jnp.zeros((bpad, cache.dpad), jnp.float32)
    x_p = x_p.at[:b, :x.shape[1]].set(x.astype(jnp.float32))

    mean, std = _anchored_forward(
        x_p, cache.w0x, cache.b0, v_pad, cache.ws, cache.bs, k,
        cache.relus, cache.relu0, cache.out_dim, tile,
        compute_dtype=cache.compute_dtype)
    return mean[:b], std[:b]
