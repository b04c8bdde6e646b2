"""Fused whole-epoch ensemble training kernel.

The real BO-trial wall-clock is dominated by small-batch training: the
reference fits ≤300 epochs × ``limit_train_batches`` steps of batch-128
rows (reference ``examples/bo_driven/config.yaml:4-11``; Lightning loop in
``nnueehcs/training.py``).  At 128-wide MLP layers each step's GEMMs are
tiny, so the XLA scanned-epoch path (``training/trainer.py:epoch_scan``) is
bound by per-op overhead and HBM round-trips, not MXU throughput (measured:
a no-BatchNorm variant gains nothing from bf16 — see docs/BENCHMARKS.md).

This kernel runs an ENTIRE training epoch as ONE Pallas program:

- grid = (steps,); the pre-gathered batch for step ``i`` streams in as a
  VMEM block while parameters, Adam moments, gradients, and BatchNorm
  running statistics live in VMEM *scratch that persists across grid
  steps* (the TPU grid is sequential).  HBM traffic per step is just the
  batch block (~5 KB) — everything else stays on-chip for the whole epoch.
- each step computes, entirely on-chip: the joint-mean (or per-member)
  ensemble forward with training-mode BatchNorm, the l1/mse loss, a full
  manual backward pass (ReLU/BatchNorm/Linear), clip-by-global-norm,
  bias-corrected AdamW, and the BatchNorm running-stat EMA — numerically
  mirroring ``optax.chain(clip_by_global_norm, scale_by_adam,
  [add_decayed_weights])`` + the trainer's ``p - lr*u`` update and
  ``nn.layers.BatchNorm1d`` semantics (biased batch var for normalisation,
  unbiased in the EMA — torch behaviour).
- the backward re-runs each member's forward (saving ``x̂`` per BatchNorm)
  instead of saving all members' activations from the loss sweep: +1
  forward of FLOPs buys an M× cut in activation VMEM, which is what lets
  8 members × 7 layers of parameters *and* both Adam moments stay resident.

All parameters ride in one flat ``(rows, 128)`` f32 buffer (`theta`), as do
the Adam moments and gradients, so the optimizer update is a handful of
large VPU ops instead of per-layer tree traffic.  Layout is built by
:func:`plan_fused_train`; eligibility is strict (the
[Linear→BatchNorm1d→ReLU]×k→Linear family every experiment config uses,
widths ≤128, VMEM budget respected) and every other case falls back to the
XLA scanned path in ``training/trainer.py``.

Replaces nothing in the reference (it has no analogue — Lightning
dispatches every batch from Python, reference ``nnueehcs/models.py:58-63``);
this is the TPU-native design for the same training loop.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import Linear, BatchNorm1d, ReLU
from ..nn.layers import Dropout as _Dropout

# VMEM working-set budget (bytes).  Per-core VMEM is ~16 MB; leave room
# for the streamed batch blocks and Mosaic temporaries.
_VMEM_BUDGET = 14 * 1024 * 1024 + 512 * 1024


def _pad8(v: int) -> int:
    return -(-v // 8) * 8


@dataclasses.dataclass(frozen=True)
class _Lin:
    """Static layout of one (Dropout?)→Linear(+BatchNorm)(+ReLU) block
    inside a member's parameter slab (row offsets relative to the slab)."""
    layer: int            # index of the Linear in net.layers
    bn_layer: int         # index of the BatchNorm1d, or -1
    w_off: int
    in_rows: int          # padded rows of W (128 for hidden, pad8(d) first)
    in_w: int             # true input width
    out_w: int            # true output width
    b_off: int            # bias row, or -1
    g_off: int            # BN scale row, or -1
    be_off: int           # BN bias row, or -1
    mean_off: int         # BN running-mean row in sigma slab, or -1
    var_off: int          # BN running-var row, or -1
    zh_idx: int           # index into the zhat scratch, or -1
    relu: bool
    mask_idx: int = -1    # index into the dropout-mask scratch, or -1


@dataclasses.dataclass(frozen=True)
class FusedTrainPlan:
    lins: Tuple[_Lin, ...]
    slab_rows: int        # padded rows per member in theta/m/v/g
    sig_rows: int         # padded rows per member in sigma
    num_members: int
    batch: int
    in_pad: int           # padded input feature width (pad8)
    out_pad: int          # padded target width (pad8)
    n_bn: int
    bn_eps: float
    bn_mom: float
    loss: str             # 'l1_loss' | 'mse_loss'
    per_member: bool
    clip: Optional[float]
    weight_decay: float
    b1: float = 0.9
    b2: float = 0.999
    adam_eps: float = 1e-8
    # bf16 GEMM operands with f32 accumulation ('bf16-mixed' precision):
    # master weights, BN statistics, loss and the whole optimizer stay f32
    bf16: bool = False
    # params pytree has a leading member axis (ensembles) vs a single
    # unstacked net (MC dropout)
    member_stacked: bool = True
    n_drop: int = 0       # dropout-mask scratch slots

    @property
    def total_rows(self) -> int:
        return self.slab_rows * self.num_members

    @property
    def total_sig_rows(self) -> int:
        return self.sig_rows * self.num_members

    def vmem_bytes(self, steps_hint: int = 1024) -> int:
        lane = 128 * 4
        buffers = 4 * self.total_rows * lane        # theta, m, v, g
        sigma = self.total_sig_rows * lane
        zhat = self.n_bn * self.batch * lane        # one member's x̂ stack
        inv = self.n_bn * lane
        masks = max(self.n_drop, 1) * self.batch * lane
        losses = steps_hint * lane                  # resident loss rows
        batch_io = 2 * self.batch * (self.in_pad + self.out_pad) * 4
        return buffers + sigma + zhat + inv + masks + losses + batch_io


def plan_fused_train(net, num_members: int, batch: int, *,
                     loss: str = 'l1_loss', per_member: bool = False,
                     clip: Optional[float] = None,
                     weight_decay: float = 0.0,
                     bf16: bool = False,
                     member_stacked: bool = True) -> Optional[FusedTrainPlan]:
    """Build the static layout, or None when the net/config is outside the
    fused family ([Dropout?→Linear→BatchNorm1d→ReLU?]×k→Linear, widths
    ≤128, VMEM budget, supported loss).  Dropout masks come from the
    on-chip PRNG (a different — statistically equivalent — stream than the
    jax.random path, same trade the fused MC-dropout eval kernel makes)."""
    if loss not in ('l1_loss', 'mse_loss', 'gaussian_nll'):
        return None
    if batch < 2 or batch % 8 != 0:
        return None

    layers = list(net.layers)
    lins = []
    row = 0
    sig_row = 0
    zh = 0
    n_drop = 0
    i = 0
    while i < len(layers):
        has_drop = False
        if isinstance(layers[i], _Dropout):
            has_drop = True
            i += 1
            if i >= len(layers):
                return None
        lay = layers[i]
        if not isinstance(lay, Linear):
            return None
        if not lay.bias:
            return None
        in_w, out_w = lay.in_features, lay.out_features
        if out_w > 128 or in_w > 128:
            return None
        first = not lins          # first *block* (a leading Dropout shifts
        in_rows = _pad8(in_w) if first else 128   # the Linear's index)
        j = i + 1
        bn_layer = -1
        g_off = be_off = mean_off = var_off = -1
        zh_idx = -1
        if j < len(layers) and isinstance(layers[j], BatchNorm1d):
            bn = layers[j]
            if not bn.affine or bn.num_features != out_w:
                return None
            bn_layer = j
            j += 1
        relu = False
        if j < len(layers) and isinstance(layers[j], ReLU):
            relu = True
            j += 1
        is_last = j >= len(layers)
        if not is_last and bn_layer < 0:
            # backward recomputes each block's input from the previous
            # block's saved x̂ — requires BN on every non-final block
            return None
        if relu and bn_layer < 0:
            return None
        w_off = row
        row += in_rows
        b_off = row
        row += 1
        if bn_layer >= 0:
            g_off, be_off = row, row + 1
            row += 2
            mean_off, var_off = sig_row, sig_row + 1
            sig_row += 2
            zh_idx = zh
            zh += 1
        # a mask slot per Dropout *layer* (not per nonzero rate): the rate
        # itself is a RUNTIME kernel input, so every dropout_percent in a
        # BO sweep shares ONE compiled program
        mask_idx = -1
        if has_drop:
            mask_idx = n_drop
            n_drop += 1
        lins.append(_Lin(i, bn_layer, w_off, in_rows, in_w, out_w, b_off,
                         g_off, be_off, mean_off, var_off, zh_idx, relu,
                         mask_idx=mask_idx))
        i = j
    if not lins or lins[-1].bn_layer >= 0 or lins[-1].relu:
        return None
    if loss == 'gaussian_nll' and lins[-1].out_w != 2:
        return None          # MVE head is exactly (mu, raw variance)

    bn0 = next((layers[L.bn_layer] for L in lins if L.bn_layer >= 0), None)
    plan = FusedTrainPlan(
        lins=tuple(lins),
        slab_rows=_pad8(row),
        sig_rows=_pad8(max(sig_row, 1)),
        num_members=num_members,
        batch=batch,
        in_pad=_pad8(lins[0].in_w),
        out_pad=_pad8(lins[-1].out_w),
        n_bn=max(zh, 1),
        bn_eps=float(bn0.eps) if bn0 is not None else 1e-5,
        bn_mom=float(bn0.momentum) if bn0 is not None else 0.1,
        loss=loss,
        per_member=per_member,
        clip=float(clip) if clip else None,
        weight_decay=float(weight_decay or 0.0),
        bf16=bool(bf16),
        member_stacked=bool(member_stacked),
        n_drop=n_drop,
    )
    if not member_stacked and num_members != 1:
        return None
    # all BN layers must share eps/momentum (they do in every config)
    for L in lins:
        if L.bn_layer >= 0:
            b = layers[L.bn_layer]
            if b.eps != plan.bn_eps or b.momentum != plan.bn_mom:
                return None
    if plan.vmem_bytes() > _VMEM_BUDGET:
        return None
    return plan


# ---------------------------------------------------------------------------
# pack / unpack between the model pytrees and the flat buffers
# ---------------------------------------------------------------------------
def pack_tree(plan: FusedTrainPlan, tree) -> jnp.ndarray:
    """Params-shaped pytree (tuple of per-layer dicts, leading member axis)
    → flat (total_rows, 128) f32 buffer."""
    M = plan.num_members
    out = jnp.zeros((M, plan.slab_rows, 128), jnp.float32)
    for L in plan.lins:
        w = _stacked(plan, tree[L.layer]['w'])
        out = out.at[:, L.w_off:L.w_off + L.in_w, :L.out_w].set(w)
        b = _stacked(plan, tree[L.layer]['b'])
        out = out.at[:, L.b_off, :L.out_w].set(b)
        if L.bn_layer >= 0:
            sc = _stacked(plan, tree[L.bn_layer]['scale'])
            bi = _stacked(plan, tree[L.bn_layer]['bias'])
            out = out.at[:, L.g_off, :L.out_w].set(sc)
            out = out.at[:, L.be_off, :L.out_w].set(bi)
    return out.reshape(M * plan.slab_rows, 128)


def _stacked(plan: FusedTrainPlan, leaf):
    """Leaf with a leading member axis (added for unstacked nets)."""
    a = jnp.asarray(leaf, jnp.float32)
    return a if plan.member_stacked else a[None]


def _unstack(plan: FusedTrainPlan, a):
    return a if plan.member_stacked else a[0]


def unpack_tree(plan: FusedTrainPlan, theta, template) -> tuple:
    """Flat buffer → pytree with the template's structure."""
    M = plan.num_members
    th = theta.reshape(M, plan.slab_rows, 128)
    new = [dict(d) for d in template]
    for L in plan.lins:
        new[L.layer] = {
            'w': _unstack(plan, th[:, L.w_off:L.w_off + L.in_w, :L.out_w]),
            'b': _unstack(plan, th[:, L.b_off, :L.out_w]),
        }
        if L.bn_layer >= 0:
            new[L.bn_layer] = {
                'scale': _unstack(plan, th[:, L.g_off, :L.out_w]),
                'bias': _unstack(plan, th[:, L.be_off, :L.out_w]),
            }
    return tuple(new)


def pack_state(plan: FusedTrainPlan, state) -> jnp.ndarray:
    M = plan.num_members
    out = jnp.concatenate(
        [jnp.zeros((M, plan.sig_rows, 64), jnp.float32),
         jnp.zeros((M, plan.sig_rows, 64), jnp.float32)], axis=-1)
    for L in plan.lins:
        if L.bn_layer >= 0:
            mean = _stacked(plan, state[L.bn_layer]['mean'])
            var = _stacked(plan, state[L.bn_layer]['var'])
            out = out.at[:, L.mean_off, :L.out_w].set(mean)
            out = out.at[:, L.var_off, :L.out_w].set(var)
    return out.reshape(M * plan.sig_rows, 128)


def unpack_state(plan: FusedTrainPlan, sigma, template) -> tuple:
    M = plan.num_members
    sg = sigma.reshape(M, plan.sig_rows, 128)
    new = [dict(d) for d in template]
    for L in plan.lins:
        if L.bn_layer >= 0:
            new[L.bn_layer] = {
                'mean': _unstack(plan, sg[:, L.mean_off, :L.out_w]),
                'var': _unstack(plan, sg[:, L.var_off, :L.out_w]),
            }
    return tuple(new)


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------
def _loss_div(plan) -> float:
    """Mean divisor: B·out_w for element-wise losses; B for the Gaussian
    NLL (one likelihood term per row — models/mve.gaussian_nll averages
    over the (B, 1) term matrix)."""
    B, ow = plan.batch, plan.lins[-1].out_w
    return float(B) if plan.loss == 'gaussian_nll' else float(B * ow)


def _loss_and_grad(plan, pred, ypad):
    """(Σ loss-term, dL/dpred scaled by the mean divisor) for the padded
    (B, 128) prediction — padded lanes of pred/ypad are exactly zero so
    the sums run over true entries only."""
    B, ow = plan.batch, plan.lins[-1].out_w
    denom = _loss_div(plan)
    if plan.loss == 'gaussian_nll':
        # MVE head (models/mve.py:25-29): col0 = mu, col1 = raw variance,
        # var = softplus(raw) + 1e-6.  Lane moves ride one-hot matmuls on
        # the MXU; every intermediate is masked to lane 0.
        rows = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        P10 = jnp.logical_and(rows == 1, cols == 0).astype(jnp.float32)
        P01 = jnp.logical_and(rows == 0, cols == 1).astype(jnp.float32)

        def lane_mm(a, P):
            return jax.lax.dot_general(
                a, P, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        colm = jax.lax.broadcasted_iota(jnp.int32, pred.shape, 1)
        e0 = (colm == 0).astype(jnp.float32)
        mu0 = pred * e0
        y0 = ypad * e0
        raw0 = lane_mm(pred, P10)                 # raw variance in lane 0
        var0 = jax.nn.softplus(raw0) + 1e-6
        inv0 = 1.0 / var0
        diff0 = mu0 - y0
        sq0 = diff0 * diff0
        terms = e0 * (0.5 * jnp.log(var0) + 0.5 * sq0 * inv0)
        dmu0 = diff0 * inv0 / denom               # masked via diff0
        draw0 = (0.5 * (inv0 - sq0 * inv0 * inv0)
                 * jax.nn.sigmoid(raw0) * e0 / denom)
        return jnp.sum(terms), dmu0 + lane_mm(draw0, P01)
    diff = pred - ypad
    if plan.loss == 'l1_loss':
        # match jax.grad(abs)'s convention of 1.0 at diff == 0 (sign()
        # would give 0 there), but only on true lanes — padded lanes have
        # diff exactly 0 and must not contribute gradient
        cols = jax.lax.broadcasted_iota(jnp.int32, pred.shape, 1)
        lane = (cols < ow).astype(jnp.float32)
        g = jnp.where(diff >= 0.0, lane, -lane)
        return jnp.sum(jnp.abs(diff)), g / denom
    return jnp.sum(diff * diff), 2.0 * diff / denom


def _epoch_kernel(plan: FusedTrainPlan, lr_ref, step0_ref, seed_ref,
                  drops_ref, x_ref, y_ref,
                  th_in, m_in, v_in, sg_in,
                  th_out, m_out, v_out, sg_out, loss_ref,
                  th_s, m_s, v_s, g_s, sg_s, zh_s, inv_s, mk_s, sem):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    B = plan.batch
    M = plan.num_members
    lins = plan.lins

    @pl.when(i == 0)
    def _load():
        for src, dst in ((th_in, th_s), (m_in, m_s), (v_in, v_s),
                         (sg_in, sg_s)):
            dma = pltpu.make_async_copy(src, dst, sem)
            dma.start()
            dma.wait()
        # slab-padding rows are never written by the backward; zero once so
        # they can't contaminate the global grad norm
        g_s[:] = jnp.zeros_like(g_s)

    x = x_ref[0]                                    # (B, in_pad)
    y = y_ref[0].astype(jnp.float32)                # (B, out_pad)

    # GEMM operand dtype: bf16-mixed casts both operands at each dot and
    # accumulates f32 on the MXU; everything else stays f32
    cdt = jnp.bfloat16 if plan.bf16 else jnp.float32

    def mm(a_, b_, dims=(((1,), (0,)), ((), ()))):
        return jax.lax.dot_general(a_.astype(cdt), b_.astype(cdt),
                                   dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)
    ypad = jnp.concatenate(
        [y, jnp.zeros((B, 128 - plan.out_pad), jnp.float32)], axis=1)

    def _gen_mask(keep, shape, salt):
        """Stateless counter-based dropout mask: position ⊕ salt through a
        murmur3-style finalizer (lowbias32), top 24 bits → uniform [0,1),
        keep-mask scaled by 1/keep.  Pure lax ops, so the stream is
        bit-identical between the compiled TPU kernel and the interpreter
        (unlike the hardware PRNG the fused eval kernel uses) — the same
        (seed, step, member, layer) always regenerates the same mask."""
        bc = jax.lax.bitcast_convert_type
        r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        # mix in int32 with two's-complement wraparound (bit-identical to
        # the uint32 sum mod 2^32); Mosaic's tpu.bitcast is vector-only,
        # so the scalar salt must never be bitcast — only the mixed vector
        mix = (salt * jnp.int32(-1640531527)        # 0x9E3779B9
               + r * jnp.int32(-2048144789)          # 0x85EBCA6B
               + c * jnp.int32(-1028477387))         # 0xC2B2AE35
        x = bc(mix, jnp.uint32)
        x = x ^ (x >> jnp.uint32(16))
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> jnp.uint32(15))
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> jnp.uint32(16))
        u = bc(x >> jnp.uint32(8), jnp.int32).astype(jnp.float32) \
            * (1.0 / (1 << 24))
        # where() (not mask*1/keep) so rate 1.0 yields exact zeros like
        # nn.layers.Dropout instead of 0·inf = NaN
        return jnp.where(u < keep, 1.0 / keep, 0.0)

    def forward(m, update_ema, save_zhat, save_masks=False):
        """One member's training-mode forward.  Dropout masks are a pure
        function of (seed, step, member, layer), so the loss sweep and the
        backward's recompute regenerate the exact same stochasticity
        without storing masks across members."""
        base = m * plan.slab_rows
        sbase = m * plan.sig_rows
        h = x.astype(jnp.float32)
        for L in lins:
            if L.mask_idx >= 0:
                # step stride deliberately differs from the trainer's
                # per-epoch seed stride (trainer._epoch_seed, 7919) — equal
                # strides would repeat epoch e's step-i masks as epoch
                # e+1's step-(i-1) masks along fit anti-diagonals
                salt = (seed_ref[0, 0] + i * 1225253 + m * 131071
                        + L.mask_idx * 524287)
                mask = _gen_mask(1.0 - drops_ref[L.mask_idx, 0], h.shape,
                                 salt)
                if save_masks:
                    mk_s[L.mask_idx, :, :h.shape[1]] = mask
                h = h * mask
            W = th_s[base + L.w_off:base + L.w_off + L.in_rows, :]
            z = mm(h, W) + th_s[base + L.b_off, :][None, :]
            if L.bn_layer >= 0:
                mu = jnp.mean(z, axis=0)
                c = z - mu[None, :]
                var = jnp.mean(c * c, axis=0)
                inv = jax.lax.rsqrt(var + plan.bn_eps)
                zh = c * inv[None, :]
                if save_zhat:
                    zh_s[L.zh_idx, :, :] = zh
                    inv_s[L.zh_idx, :] = inv
                if update_ema:
                    mom = plan.bn_mom
                    unb = var * (B / (B - 1))
                    mo, vo = sbase + L.mean_off, sbase + L.var_off
                    sg_s[mo, :] = (1 - mom) * sg_s[mo, :] + mom * mu
                    sg_s[vo, :] = (1 - mom) * sg_s[vo, :] + mom * unb
                h = zh * th_s[base + L.g_off, :][None, :] \
                    + th_s[base + L.be_off, :][None, :]
            else:
                h = z
            if L.relu:
                h = jnp.maximum(h, 0.0)
        return h

    ow = lins[-1].out_w
    # single-sweep mode: when the loss decouples across members (per-member
    # loss, or a single net) the backward's recomputed forward doubles as
    # the loss pass — one forward fewer per member
    single_sweep = plan.per_member or M == 1

    dpred_shared = None
    loss_sum = jnp.float32(0.0)
    if not single_sweep:
        # joint-mean loss couples members: loss sweep first (EMA here)
        predsum = None
        for m in range(M):
            h = forward(m, update_ema=True, save_zhat=False)
            predsum = h if predsum is None else predsum + h
        predm = predsum * (1.0 / M)
        term, dpred_shared = _loss_and_grad(plan, predm, ypad)
        loss_t = term / _loss_div(plan)
        dpred_shared = dpred_shared * (1.0 / M)

    # ---- backward: recompute each member's forward (saving x̂/inv and any
    # dropout masks), then walk the chain in reverse writing grads into g_s
    for m in range(M):
        base = m * plan.slab_rows
        h = forward(m, update_ema=single_sweep, save_zhat=True,
                    save_masks=plan.n_drop > 0)
        if single_sweep:
            term, d = _loss_and_grad(plan, h, ypad)
            loss_sum = loss_sum + term
            d = d * (1.0 / M)
        else:
            d = dpred_shared
        for li in range(len(lins) - 1, -1, -1):
            L = lins[li]
            if L.relu:
                act = zh_s[L.zh_idx, :, :] \
                    * th_s[base + L.g_off, :][None, :] \
                    + th_s[base + L.be_off, :][None, :]
                d = d * (act > 0.0).astype(jnp.float32)
            if L.bn_layer >= 0:
                zh = zh_s[L.zh_idx, :, :]
                g_s[base + L.g_off, :] = jnp.sum(d * zh, axis=0)
                g_s[base + L.be_off, :] = jnp.sum(d, axis=0)
                dzh = d * th_s[base + L.g_off, :][None, :]
                s1 = jnp.sum(dzh, axis=0)
                s2 = jnp.sum(dzh * zh, axis=0)
                inv = inv_s[L.zh_idx, :]
                d = (inv[None, :] / B) * (B * dzh - s1[None, :]
                                          - zh * s2[None, :])
            if li == 0:
                a = x.astype(jnp.float32)
                if L.mask_idx >= 0:
                    a = a * mk_s[L.mask_idx, :, :a.shape[1]]
            else:
                P = lins[li - 1]
                a = zh_s[P.zh_idx, :, :] \
                    * th_s[base + P.g_off, :][None, :] \
                    + th_s[base + P.be_off, :][None, :]
                if P.relu:
                    a = jnp.maximum(a, 0.0)
                if L.mask_idx >= 0:
                    a = a * mk_s[L.mask_idx, :, :]
            dW = mm(a, d, (((0,), (0,)), ((), ())))
            g_s[base + L.w_off:base + L.w_off + L.in_rows, :] = dW
            g_s[base + L.b_off, :] = jnp.sum(d, axis=0)
            if li > 0:
                W = th_s[base + L.w_off:base + L.w_off + L.in_rows, :]
                d = mm(d, W, (((1,), (1,)), ((), ())))
                if L.mask_idx >= 0:
                    d = d * mk_s[L.mask_idx, :, :]

    if single_sweep:
        loss_t = loss_sum / (_loss_div(plan) * M)

    # ---- optimizer: clip-by-global-norm → bias-corrected Adam → weight
    # decay → p -= lr*u  (mirrors the trainer's optax chain exactly).
    # Chunked over row blocks: Mosaic allocates elementwise intermediates
    # on the VMEM stack, so full-buffer expressions would transiently cost
    # several extra copies of the parameter set.
    R = plan.total_rows
    CH = 1024
    if plan.clip is not None:
        gn2 = jnp.float32(0.0)
        for r0 in range(0, R, CH):
            r1 = min(r0 + CH, R)
            gch = g_s[r0:r1, :]
            gn2 = gn2 + jnp.sum(gch * gch)
        gn = jnp.sqrt(gn2)
        scale = jax.lax.select(gn < plan.clip, jnp.float32(1.0),
                               plan.clip / gn)
    else:
        scale = jnp.float32(1.0)
    t = (step0_ref[0, 0] + i + 1).astype(jnp.float32)
    # b^t as exp(t·ln b) — Mosaic has no powf lowering
    c1 = 1.0 - jnp.exp(t * float(np.log(plan.b1)))
    c2 = 1.0 - jnp.exp(t * float(np.log(plan.b2)))
    lr = lr_ref[0, 0]
    for r0 in range(0, R, CH):
        r1 = min(r0 + CH, R)
        g = g_s[r0:r1, :] * scale
        mn = plan.b1 * m_s[r0:r1, :] + (1.0 - plan.b1) * g
        vn = plan.b2 * v_s[r0:r1, :] + (1.0 - plan.b2) * g * g
        m_s[r0:r1, :] = mn
        v_s[r0:r1, :] = vn
        u = (mn / c1) / (jnp.sqrt(vn / c2) + plan.adam_eps)
        if plan.weight_decay:
            u = u + plan.weight_decay * th_s[r0:r1, :]
        th_s[r0:r1, :] = th_s[r0:r1, :] - lr * u

    from jax.experimental import pallas as _pl
    loss_ref[_pl.ds(i, 1), :] = jnp.full((1, 128), loss_t, jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _store():
        for src, dst in ((th_s, th_out), (m_s, m_out), (v_s, v_out),
                         (sg_s, sg_out)):
            dma = pltpu.make_async_copy(src, dst, sem)
            dma.start()
            dma.wait()


def drop_rates(net) -> jnp.ndarray:
    """Per-mask-slot dropout probabilities in block order — the RUNTIME
    companion to a plan's ``n_drop`` slots.  Rates are a kernel input, not
    a compile-time constant, so a BO sweep over ``dropout_percent`` shares
    one compiled program."""
    rates = [float(l.p) for l in net.layers if isinstance(l, _Dropout)]
    if not rates:
        return jnp.zeros((1, 1), jnp.float32)
    return jnp.asarray(rates, jnp.float32).reshape(-1, 1)


@functools.partial(jax.jit,
                   static_argnames=('plan', 'interpret'),
                   donate_argnums=(1, 2, 3, 4))
def fused_epoch(plan: FusedTrainPlan, theta, m, v, sigma, xs, ys, lr,
                step0, seed=0, drops=None, interpret: bool = False):
    """Run one training epoch (xs: (S, B, in_pad), ys: (S, B, out_pad)) as
    a single Pallas program.  ``seed`` drives the in-kernel dropout PRNG
    and ``drops`` carries the per-slot dropout probabilities
    (``drop_rates(net)``); both are ignored for dropout-free chains.
    Returns (theta, m, v, sigma, losses[S])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = xs.shape[0]
    R, G = plan.total_rows, plan.total_sig_rows
    if drops is None:
        drops = jnp.zeros((max(plan.n_drop, 1), 1), jnp.float32)
    else:
        drops = jnp.asarray(drops, jnp.float32).reshape(-1, 1)

    kernel = functools.partial(_epoch_kernel, plan)
    flat = pl.BlockSpec(memory_space=pl.ANY)
    smem_scalar = pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
    smem_drops = pl.BlockSpec((max(plan.n_drop, 1), 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)

    theta, m, v, sigma, losses = pl.pallas_call(
        kernel,
        grid=(S,),
        in_specs=[
            smem_scalar,                                     # lr
            smem_scalar,                                     # step0
            smem_scalar,                                     # dropout seed
            smem_drops,                                      # dropout rates
            pl.BlockSpec((1, plan.batch, plan.in_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # xs
            pl.BlockSpec((1, plan.batch, plan.out_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # ys
            flat, flat, flat, flat,                          # theta m v sigma
        ],
        out_specs=[
            flat, flat, flat, flat,
            # per-step losses stay VMEM-resident for the whole epoch (one
            # full-array block; ~512 KB at 1000 steps) and flush once
            pl.BlockSpec((S, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),           # losses
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 128), jnp.float32),
            jax.ShapeDtypeStruct((S, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),               # theta
            pltpu.VMEM((R, 128), jnp.float32),               # m
            pltpu.VMEM((R, 128), jnp.float32),               # v
            pltpu.VMEM((R, 128), jnp.float32),               # grads
            pltpu.VMEM((G, 128), jnp.float32),               # sigma
            pltpu.VMEM((plan.n_bn, plan.batch, 128), jnp.float32),
            pltpu.VMEM((plan.n_bn, 128), jnp.float32),
            pltpu.VMEM((max(plan.n_drop, 1), plan.batch, 128),
                       jnp.float32),                         # dropout masks
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=_VMEM_BUDGET + 2 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(lr, jnp.float32).reshape(1, 1),
      jnp.asarray(step0, jnp.int32).reshape(1, 1),
      jnp.asarray(seed, jnp.int32).reshape(1, 1),
      drops,
      xs, ys, theta, m, v, sigma)
    return theta, m, v, sigma, losses[:, 0]


def gather_epoch_batches(plan: FusedTrainPlan, x, y, idx_flat):
    """Device-side gather of the epoch's shuffled batches into the padded
    (S, B, in_pad)/(S, B, out_pad) layout the kernel streams (traceable)."""
    S = idx_flat.shape[0] // plan.batch
    xb = jnp.asarray(x, jnp.float32)[idx_flat]
    yb = jnp.asarray(y, jnp.float32)[idx_flat]
    if yb.ndim == 1:
        yb = yb[:, None]
    d = xb.shape[1]
    if d < plan.in_pad:
        xb = jnp.pad(xb, ((0, 0), (0, plan.in_pad - d)))
    ow = yb.shape[1]
    if ow < plan.out_pad:
        yb = jnp.pad(yb, ((0, 0), (0, plan.out_pad - ow)))
    return (xb.reshape(S, plan.batch, plan.in_pad),
            yb.reshape(S, plan.batch, plan.out_pad))


def gather_anchored_epoch_batches(plan: FusedTrainPlan, x, y, idx_flat,
                                  epoch_rng):
    """Δ-UQ/PAGER stochastic-centering batches (traceable): per step the
    (B, d) batch doubles to ``(2B, 2d) = [concat([a1, x−a1]);
    concat([a2, x−a2])]`` with a1/a2 independent permutations of the batch
    itself, targets ``[y; y]`` (reference ``nnueehcs/models.py:306-311``
    via models/delta_uq.train_output).  The per-step keys replicate the
    trainer's scan path exactly — ``fold_in(epoch_rng, step)`` then
    ``fold_in(·, 0/1)`` — so the fused and scan Δ-UQ paths see
    bit-identical anchor draws.  ``plan.batch`` is the *doubled* batch."""
    B = plan.batch // 2
    S = idx_flat.shape[0] // B
    xb = jnp.asarray(x, jnp.float32)[idx_flat].reshape(S, B, -1)
    yb = jnp.asarray(y, jnp.float32)[idx_flat]
    if yb.ndim == 1:
        yb = yb[:, None]
    yb = yb.reshape(S, B, -1)

    def one_step(s, xs):
        rng = jax.random.fold_in(epoch_rng, s)
        a1 = xs[jax.random.permutation(jax.random.fold_in(rng, 0), B)]
        a2 = xs[jax.random.permutation(jax.random.fold_in(rng, 1), B)]
        return jnp.concatenate(
            [jnp.concatenate([a1, xs - a1], axis=-1),
             jnp.concatenate([a2, xs - a2], axis=-1)], axis=0)

    xs2 = jax.vmap(one_step)(jnp.arange(S), xb)          # (S, 2B, 2d)
    ys2 = jnp.concatenate([yb, yb], axis=1)              # (S, 2B, out)
    d2 = xs2.shape[-1]
    if d2 < plan.in_pad:
        xs2 = jnp.pad(xs2, ((0, 0), (0, 0), (0, plan.in_pad - d2)))
    ow = ys2.shape[-1]
    if ow < plan.out_pad:
        ys2 = jnp.pad(ys2, ((0, 0), (0, 0), (0, plan.out_pad - ow)))
    return xs2, ys2
