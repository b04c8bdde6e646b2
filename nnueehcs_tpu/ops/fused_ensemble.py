"""Fused UQ evaluation kernels.

The flagship UQ workloads — member/sample fan-outs over small
[Linear→BatchNorm→ReLU]×k MLPs — are small enough that the *entire* weight
set fits in VMEM (8 members × 7 layers × 128×128 f32 ≈ 15 MB padded).  The
generic vmap paths re-read activations from HBM every layer; the kernels
here instead:

1. fold eval-mode BatchNorm affine transforms into the preceding Linear
   (``W' = W ∘ (γ/σ)``, ``b' = (b − μ)·γ/σ + β``), leaving a pure
   Linear(+ReLU) chain,
2. run one Pallas program per batch tile with all weights VMEM-resident,
   the member/sample loop on-chip (MC-dropout masks from the TPU PRNG),
3. accumulate *shifted* sums on-chip — deltas against a reference forward —
   so the one-pass variance never cancels catastrophically even when
   ``|mean| ≫ std``, and write only the (tile, out) mean/std to HBM.

Measured on one v5e chip (262k rows): ensemble-8 UE 27.1M samples/s at
tile 1024 with the classic row-major input (330–590× the torch-CPU
reference depending on host load; vmap path 17.8M/s); the round-5
transposed-input ('xt') layout adds +6.6% interleaved same-conditions
(experiments/grid_r5/xt_ab.out) and is the default.  MC-dropout-128 UE
2.94M/s (20.6× the naive path).  A fused anchored (Δ-UQ) kernel was prototyped and
measured *slower* than the vmap path — XLA already loop-fuses the
anchor-axis reduction without materialising the (k, B, width) intermediate
(~2.8M samples/s at k=100) — so the vmap path stays for anchoring.

Engaged automatically through ``model()`` on TPU when the architecture
matches; every non-TPU/unfusable case falls back to the vmap paths.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import Linear, BatchNorm1d, ReLU, Dropout

# VMEM working-set cap for the fused kernels (per-core VMEM is ~16 MB;
# leave headroom for activations and pipelining buffers).
_VMEM_BUDGET = 10 * 1024 * 1024


def _round_up(v, m):
    return -(-v // m) * m


# ---------------------------------------------------------------------------
# folding
# ---------------------------------------------------------------------------
def _fold_linear_chain(net, params, state, allow_dropout: bool):
    """Fold a [Dropout?, Linear, BatchNorm1d?, ReLU?]* chain into
    ``(folded, drops)`` where ``folded`` is a list of ``(W, b, relu_after)``
    (leading member axes preserved as-is) and ``drops[i]`` is the dropout
    probability applied *before* linear ``i``.  Returns None when the
    structure doesn't match."""
    layers = list(net.layers)
    folded, drops = [], []
    i = 0
    while i < len(layers):
        p_drop = 0.0
        if isinstance(layers[i], Dropout):
            if not allow_dropout:
                return None
            p_drop = float(layers[i].p)
            i += 1
        if i >= len(layers) or not isinstance(layers[i], Linear):
            return None
        layer = layers[i]
        w = jnp.asarray(params[i]['w'])
        b = jnp.asarray(params[i]['b']) if layer.bias else \
            jnp.zeros(w.shape[:-2] + (w.shape[-1],), w.dtype)
        j = i + 1
        if j < len(layers) and isinstance(layers[j], BatchNorm1d):
            bn = layers[j]
            mean = jnp.asarray(state[j]['mean'])
            var = jnp.asarray(state[j]['var'])
            inv = jax.lax.rsqrt(var + bn.eps)
            if bn.affine:
                gamma = jnp.asarray(params[j]['scale'])
                beta = jnp.asarray(params[j]['bias'])
            else:
                gamma = jnp.ones_like(mean)
                beta = jnp.zeros_like(mean)
            scale = inv * gamma
            w = w * scale[..., None, :]
            b = (b - mean) * scale + beta
            j += 1
        relu = False
        if j < len(layers) and isinstance(layers[j], ReLU):
            relu = True
            j += 1
        folded.append((w, b, relu))
        drops.append(p_drop)
        i = j
    return folded, drops


def fold_ensemble_params(net, params, state):
    """Dropout-free fold for stacked-member ensembles (returns the folded
    list only, for compatibility)."""
    result = _fold_linear_chain(net, params, state, allow_dropout=False)
    return None if result is None else result[0]


def fold_mc_dropout_params(net, params, state):
    """Fold for single-member MC-dropout nets; adds the member axis."""
    result = _fold_linear_chain(net, params, state, allow_dropout=True)
    if result is None:
        return None
    folded, drops = result
    folded = [(w[None], b[None], relu) for w, b, relu in folded]
    return folded, drops


def _check_widths(folded, out_dim):
    """Hidden activations live as (tile, 128) blocks: every output width
    (and every non-first input width) must fit 128."""
    if out_dim > 128:
        return False
    for idx, (w, _, _) in enumerate(folded):
        if w.shape[-1] > 128 or (idx > 0 and w.shape[-2] > 128):
            return False
    return True


def _pad_folded(folded, num_members, compute_dtype=jnp.float32,
                slim_first=False, xt_first=False):
    """Pad the folded chain to MXU tiles.  Weights are stored in
    ``compute_dtype`` (bf16 puts the GEMM operands on the MXU fast path);
    biases stay f32 — the bias add rides the f32 accumulator.
    ``slim_first`` pads the first layer's input dim only to the sublane
    quantum (16 covers f32 and bf16) instead of 128 — for a 5-feature
    input that drops the first GEMM's padded FLOPs 8× and shrinks the
    streamed x_pad rows from 128 to 16 lanes.
    ``xt_first`` pads the first layer's input dim to the f32 sublane
    quantum (8) for the transposed-input layout, where x streams as a
    dense (d_pad, tile) slab and the first GEMM contracts dim 0 of both
    operands (see ``_fused_kernel`` layout='xt')."""
    ws, bs, relus = [], [], []
    for idx, (w, b, relu) in enumerate(folded):
        first_quantum = 8 if xt_first else (16 if slim_first else 128)
        in_pad = _round_up(w.shape[-2], first_quantum if idx == 0 else 128)
        w_p = jnp.zeros((num_members, in_pad, 128), compute_dtype)
        w_p = w_p.at[:, :w.shape[-2], :w.shape[-1]].set(
            w.astype(compute_dtype))
        b_p = jnp.zeros((num_members, 128), jnp.float32)
        b_p = b_p.at[:, :b.shape[-1]].set(b.astype(jnp.float32))
        ws.append(w_p)
        bs.append(b_p)
        relus.append(relu)
    return ws, bs, relus


def _fits_vmem(ws, bs, tile, dpad, live_bufs=6) -> bool:
    """``live_bufs`` = live (tile, 128) f32 activation/accumulator buffers:
    6 covers the member-serial kernels; the layer-outer order keeps one
    activation per member live and must pass ``num_members + 4``."""
    weight_bytes = sum(int(np.prod(w.shape)) * w.dtype.itemsize
                       for w in ws) + \
        sum(int(np.prod(b.shape)) * b.dtype.itemsize for b in bs)
    # x tile + the live activation/accumulator buffers
    work_bytes = tile * dpad * 4 + live_bufs * tile * 128 * 4
    return weight_bytes + work_bytes <= _VMEM_BUDGET


def _plan_rows(b_rows):
    """(bpad, tile) with tile ∈ {1024, 512, 256} dividing bpad.  The
    round-4 tile sweep (docs/BENCHMARKS.md) measured t1024 ≈ +9% over
    t512 at the headline shape with spreads ≤2% (fewer grid steps →
    less per-step overhead; t2048 adds nothing and t4096 fails to
    compile), so prefer the largest tile the batch covers — the padding
    waste is ≤ tile−1 rows."""
    for tile in (1024, 512, 256):
        if b_rows >= tile:
            return _round_up(b_rows, tile), tile
    return _round_up(b_rows, 256), 256


def _shifted_stats(s1, s2, c, n):
    """Mean/std from shifted sums: ``s1 = Σ(h−c)``, ``s2 = Σ(h−c)²``.
    Deltas are on the member-spread scale, so the one-pass variance formula
    doesn't cancel when |mean| ≫ std."""
    m1 = s1 / n
    mean = c + m1
    var = jnp.maximum(s2 - n * m1 * m1, 0.0) / max(n - 1, 1)
    return mean, jnp.sqrt(var)


# ---------------------------------------------------------------------------
# fused ensemble evaluation
# ---------------------------------------------------------------------------
def _fused_kernel(x_ref, *refs, num_members, num_layers, relus,
                  compute_dtype='float32', order='member', layout='wide'):
    w_refs = refs[:num_layers]
    b_refs = refs[num_layers:2 * num_layers]
    mean_ref, std_ref = refs[2 * num_layers:2 * num_layers + 2]

    cdt = jnp.dtype(compute_dtype)
    # layout='wide': x block is (tile, d_pad128) — classic row-major rows.
    # layout='xt':   x block is (d_pad8, tile) — the input streams
    # TRANSPOSED so HBM carries the dense feature slab (e.g. 8 rows)
    # instead of a 128-lane zero-padded copy; the r5 attribution battery
    # measured the wide layout's pad op + fat DMA at +29.7% of the model
    # path (experiments/grid_r5/attrib_eval*.out, docs/BENCHMARKS.md).
    # The first GEMM contracts dim 0 of BOTH operands ((d,t)·(d,128) →
    # (t,128)) — bit-identical math, Mosaic takes transposed LHS natively.
    x = x_ref[:].astype(cdt)
    tile_rows = x.shape[1] if layout == 'xt' else x.shape[0]

    def first_layer(m):
        if layout == 'xt':
            h = jax.lax.dot_general(
                x, w_refs[0][m],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            h = jnp.dot(x, w_refs[0][m], preferred_element_type=jnp.float32)
        h = h + b_refs[0][m]
        if relus[0]:
            h = jnp.maximum(h, 0.0)
        if num_layers > 1:
            h = h.astype(cdt)
        return h

    if order == 'layer':
        # layer-outer interleave: per layer the num_members GEMMs are
        # independent and issue back-to-back, so the MXU never waits on a
        # member's serial chain and member m's VPU bias/ReLU overlaps
        # member m+1's GEMM.  Costs num_members live (TILE, 128) buffers
        # instead of 3 — still well inside VMEM at tile ≤ 1024.
        hs = [first_layer(m) for m in range(num_members)]
        for l in range(1, num_layers):
            hs = [jnp.dot(h, w_refs[l][m],
                          preferred_element_type=jnp.float32) + b_refs[l][m]
                  for m, h in enumerate(hs)]
            if relus[l]:
                hs = [jnp.maximum(h, 0.0) for h in hs]
            if l + 1 < num_layers:
                hs = [h.astype(cdt) for h in hs]
        finals = [h.astype(jnp.float32) for h in hs]
        c = finals[0]                                # shift reference
        s1 = jnp.zeros((tile_rows, 128), jnp.float32)
        s2 = jnp.zeros((tile_rows, 128), jnp.float32)
        for h in finals[1:]:
            d = h - c
            s1 = s1 + d
            s2 = s2 + d * d
        mean, std = _shifted_stats(s1, s2, c, num_members)
        mean_ref[:] = mean
        std_ref[:] = std
        return

    def member_forward(m):
        # GEMM operands in the compute dtype (bf16 → MXU fast path),
        # accumulation + bias + ReLU in f32
        h = first_layer(m)
        for l in range(1, num_layers):
            h = jnp.dot(h, w_refs[l][m], preferred_element_type=jnp.float32)
            h = h + b_refs[l][m]
            if relus[l]:
                h = jnp.maximum(h, 0.0)
            if l + 1 < num_layers:
                h = h.astype(cdt)
        return h.astype(jnp.float32)

    c = member_forward(0)                            # shift reference
    s1 = jnp.zeros((tile_rows, 128), jnp.float32)
    s2 = jnp.zeros((tile_rows, 128), jnp.float32)
    for m in range(1, num_members):
        d = member_forward(m) - c
        s1 = s1 + d
        s2 = s2 + d * d
    mean, std = _shifted_stats(s1, s2, c, num_members)
    mean_ref[:] = mean
    std_ref[:] = std


@functools.partial(jax.jit, static_argnames=('num_members', 'relus',
                                             'out_dim', 'tile',
                                             'compute_dtype', 'order',
                                             'layout', 'interpret'))
def _fused_forward(x_pad, ws, bs, num_members, relus, out_dim, tile,
                   compute_dtype='float32', order='member', layout='wide',
                   interpret=False):
    """layout='wide': ``x_pad`` is (bpad, dpad128) row-major.
    layout='xt': ``x_pad`` is (dpad8, bpad) — transposed, dense feature
    slab; HBM input traffic drops dpad128/dpad8× (16× at 5 features).
    ``interpret`` runs the Pallas kernel in interpret mode so numerics can
    be pinned off-chip (tests)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    num_layers = len(ws)
    if layout == 'xt':
        dpad, bpad = x_pad.shape
        in_specs = [pl.BlockSpec((dpad, tile), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)]
    else:
        bpad, dpad = x_pad.shape
        in_specs = [pl.BlockSpec((tile, dpad), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
    grid = (bpad // tile,)

    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0,) * 3,
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,) * 2,
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _fused_kernel, num_members=num_members, num_layers=num_layers,
        relus=relus, compute_dtype=compute_dtype, order=order,
        layout=layout)

    mean, std = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((bpad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((bpad, 128), jnp.float32)),
        interpret=interpret,
    )(x_pad, *ws, *bs)
    return mean[:, :out_dim], std[:, :out_dim]


class FusedCache:
    """Pre-folded, pre-padded weights for the fused kernel, pinned to the
    params *and* state pytree objects they were derived from."""

    def __init__(self, folded, src_params, src_state=None, ws=None, bs=None,
                 relus=None, num_members=0, out_dim=1, dpad=128,
                 compute_dtype='float32', layout='wide', in_dim=0):
        self.folded = folded
        self.src_params = src_params
        self.src_state = src_state
        self.ws = ws
        self.bs = bs
        self.relus = relus
        self.num_members = num_members
        self.out_dim = out_dim
        self.dpad = dpad
        self.compute_dtype = compute_dtype
        self.layout = layout
        self.in_dim = in_dim

    def stale_for(self, params, state) -> bool:
        return self.src_params is not params or self.src_state is not state


def prepare_fused_weights(net, params, state, layout=None) -> FusedCache:
    """Fold + pad once per parameter/state version (host-side).  Honors the
    net's bf16-mixed compute dtype: the folded GEMM operands are stored
    bf16 (accumulation, bias, ReLU and the UE statistics stay f32).

    ``layout`` picks the input streaming layout ('wide' or 'xt'); default
    is the ``NNUEEHCS_TPU_FUSED_LAYOUT`` env var or 'xt' — the r5
    attribution battery measured the transposed-input layout +15% on the
    model path at the headline shape (docs/BENCHMARKS.md round-5 note)
    because it eliminates the 128-lane zero-pad op and its 2×134 MB of
    HBM traffic.  The layout is baked into the cache at prepare time;
    set the env before the first eval."""
    import os
    if layout is None:
        layout = os.environ.get('NNUEEHCS_TPU_FUSED_LAYOUT', 'xt')
    folded = fold_ensemble_params(net, params, state)
    if folded is None:
        return FusedCache(False, params, state)
    num_members = folded[0][0].shape[0]
    out_dim = folded[-1][0].shape[-1]
    in_dim = folded[0][0].shape[-2]
    if not _check_widths(folded, out_dim):
        return FusedCache(False, params, state)
    cdt = jnp.dtype(getattr(net, 'compute_dtype', None) or jnp.float32)
    # NOTE: slim_first=True was measured SLOWER end-to-end (25.9M vs
    # 27.1M samples/s model-path, round 4) — the (tile, 16) input block's
    # narrow per-step DMA costs more than the 2×(B,128) pad traffic it
    # saves.  The 'xt' layout (round 5) beats both: the input streams
    # TRANSPOSED as a dense (8, tile) slab, so each grid step's input DMA
    # stays lane-major and full-width while HBM carries only real rows.
    ws, bs, relus = _pad_folded(folded, num_members, compute_dtype=cdt,
                                xt_first=(layout == 'xt'))
    # gate on the SMALLEST tile the row planner can pick (256):
    # fused_forward_prefolded downgrades the per-batch tile until it fits,
    # so an ensemble too big for tile 1024 still runs fused at 512/256
    # instead of silently dropping to the ~40% slower vmap path
    if not _fits_vmem(ws, bs, 256, ws[0].shape[1]):
        return FusedCache(False, params, state)
    ws = [jax.device_put(w) for w in ws]
    bs = [jax.device_put(b) for b in bs]
    return FusedCache(True, params, state, tuple(ws), tuple(bs),
                      tuple(relus), num_members, out_dim, ws[0].shape[1],
                      compute_dtype=cdt.name, layout=layout, in_dim=in_dim)


def fused_forward_prefolded(cache: FusedCache, x, interpret=False):
    """(mean, std) via the fused kernel with pre-folded weights.  Traceable
    (called inside the model's jitted eval).  The GEMM issue order is
    env-overridable (``NNUEEHCS_TPU_FUSED_ORDER=member|layer``) for
    on-chip A/B without a code edit; the default is the variant-sweep
    winner (see docs/BENCHMARKS.md round-4 sweep).  The input layout
    ('wide'/'xt') was baked into the cache by prepare_fused_weights."""
    import os
    b = x.shape[0]
    bpad, tile = _plan_rows(b)
    # halve the planned tile until the working set fits VMEM (prepare only
    # guarantees the 256 floor; 512/1024 divide bpad so the grid stays valid)
    while tile > 256 and not _fits_vmem(cache.ws, cache.bs, tile,
                                        cache.dpad):
        tile //= 2
    if cache.layout == 'xt':
        # dense transposed slab: (d_pad8, bpad).  The (b, d) -> (d, b)
        # transpose moves only the real 4·b·d bytes; the wide layout's
        # zero-pad op wrote (and the kernel re-read) 4·b·128.
        x_p = jnp.zeros((cache.dpad, bpad), jnp.float32)
        x_p = x_p.at[:x.shape[1], :b].set(x.astype(jnp.float32).T)
    else:
        x_p = jnp.zeros((bpad, cache.dpad), jnp.float32)
        x_p = x_p.at[:b, :x.shape[1]].set(x.astype(jnp.float32))
    order = os.environ.get('NNUEEHCS_TPU_FUSED_ORDER', 'member')
    if order == 'layer' and not _fits_vmem(
            cache.ws, cache.bs, tile, cache.dpad,
            live_bufs=cache.num_members + 4):
        # layer-outer keeps num_members live activation buffers; fall back
        # to the member-serial order rather than fail to compile
        order = 'member'
    mean, std = _fused_forward(x_p, cache.ws, cache.bs, cache.num_members,
                               cache.relus, cache.out_dim, tile,
                               compute_dtype=cache.compute_dtype,
                               order=order, layout=cache.layout,
                               interpret=interpret)
    return mean[:b], std[:b]


def fused_ensemble_eval(net, params, state, x, tile: int = 512,
                        layout=None, interpret=False):
    """One-shot fold + fused forward (testing convenience; hot callers use
    :func:`prepare_fused_weights` once and :func:`fused_forward_prefolded`
    per batch).  Returns None when the architecture is not fusable.
    ``interpret=True`` runs the Pallas kernel in interpret mode so the
    layouts' numerics can be pinned off-chip."""
    cache = prepare_fused_weights(net, params, state, layout=layout)
    if not cache.folded:
        return None
    return fused_forward_prefolded(cache, jnp.asarray(x),
                                   interpret=interpret)


# ---------------------------------------------------------------------------
# fused MC-dropout evaluation: weights resident in VMEM, dropout masks
# generated in-kernel with the TPU PRNG, sample loop on-chip
# ---------------------------------------------------------------------------
def _fused_mc_kernel(seed_ref, x_ref, *refs, num_samples, num_layers,
                     relus, keeps, compute_dtype='float32'):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w_refs = refs[:num_layers]
    b_refs = refs[num_layers:2 * num_layers]
    mean_ref, std_ref = refs[2 * num_layers:2 * num_layers + 2]

    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0, 0] + i)

    cdt = jnp.dtype(compute_dtype)
    x = x_ref[:]

    def forward(with_dropout):
        h = x
        for l in range(num_layers):
            if with_dropout and keeps[l] is not None:
                # uniform in [0,1) from the top 24 bits (explicitly
                # unsigned — a raw uint32 threshold compare lowers signed
                # and biases the drop rate), keep-mask scaled by 1/keep;
                # mask math stays f32 (exact keep probability) — only the
                # GEMM operands drop to the compute dtype
                keep = keeps[l]
                bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape),
                                     jnp.uint32)
                u24 = jax.lax.shift_right_logical(bits, jnp.uint32(8))
                u = pltpu.bitcast(u24, jnp.int32).astype(jnp.float32) \
                    * (1.0 / (1 << 24))
                h = h * ((u < keep).astype(jnp.float32) * (1.0 / keep))
            h = jnp.dot(h.astype(cdt), w_refs[l][0],
                        preferred_element_type=jnp.float32)
            h = h + b_refs[l][0]
            if relus[l]:
                h = jnp.maximum(h, 0.0)
        return h

    # deterministic no-dropout forward as the variance shift reference
    c = forward(with_dropout=False)

    def sample_body(s, carry):
        s1, s2 = carry
        d = forward(with_dropout=True) - c
        return s1 + d, s2 + d * d

    zeros = jnp.zeros((x.shape[0], 128), jnp.float32)
    s1, s2 = jax.lax.fori_loop(0, num_samples, sample_body, (zeros, zeros))
    mean, std = _shifted_stats(s1, s2, c, num_samples)
    mean_ref[:] = mean
    std_ref[:] = std


@functools.partial(jax.jit, static_argnames=('num_samples', 'relus',
                                             'keeps', 'out_dim', 'tile',
                                             'compute_dtype'))
def _fused_mc_forward(x_pad, seed, ws, bs, num_samples, relus, keeps,
                      out_dim, tile, compute_dtype='float32'):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bpad, dpad = x_pad.shape
    num_layers = len(ws)
    grid = (bpad // tile,)

    in_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, dpad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0,) * 3,
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,) * 2,
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(
        _fused_mc_kernel, num_samples=num_samples, num_layers=num_layers,
        relus=relus, keeps=keeps, compute_dtype=compute_dtype)

    mean, std = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((bpad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((bpad, 128), jnp.float32)),
    )(seed, x_pad, *ws, *bs)
    return mean[:, :out_dim], std[:, :out_dim]


def fused_mc_dropout_eval(net, params, state, x, num_samples: int,
                          seed=0):
    """(mean, std) over ``num_samples`` stochastic dropout passes with all
    weights VMEM-resident and masks generated by the on-chip PRNG.  The
    random stream differs from the jax.random path — statistically
    equivalent dropout (verified: deviation matches inter-seed sampling
    noise).  ``seed`` may be a Python int or a traced int32 scalar (the
    model threads its per-call PRNG stream through here).  Returns None
    when the net is not fusable."""
    result = fold_mc_dropout_params(net, params, state)
    if result is None:
        return None
    folded, drops = result
    out_dim = folded[-1][0].shape[-1]
    if not _check_widths(folded, out_dim):
        return None
    cdt = jnp.dtype(getattr(net, 'compute_dtype', None) or jnp.float32)
    ws, bs, relus = _pad_folded(folded, 1, compute_dtype=cdt)
    b_rows = x.shape[0]
    bpad, tile = _plan_rows(max(b_rows, 1))
    dpad = ws[0].shape[1]
    if not _fits_vmem(ws, bs, tile, dpad):
        return None
    keeps = tuple(None if p <= 0.0 else (1.0 - p) for p in drops)

    x_p = jnp.zeros((bpad, dpad), jnp.float32)
    x_p = x_p.at[:b_rows, :x.shape[1]].set(x.astype(jnp.float32))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    mean, std = _fused_mc_forward(x_p, seed_arr, tuple(ws), tuple(bs),
                                  num_samples, tuple(relus), keeps,
                                  out_dim, tile, compute_dtype=cdt.name)
    return mean[:b_rows], std[:b_rows]
