"""Fused-ensemble eval kernel: attribute the missing ~82% of the roofline.

VERDICT r4 weak #1 / next-round item 2: the headline kernel has sat at
~18% MFU (27-32M samples/s) for four rounds; the r3/r4 variant sweeps
proved dtype, GEMM order, slim-first padding and (mostly) tile size are
NOT levers, but nobody has *measured where the time goes*.  This script
runs an ablation battery at the headline shape (262144x5, 8 members,
7-layer 128-wide chain, tile 1024) that decomposes one pass into:

  io_floor      grid + input DMA + both output DMAs, zero compute
  one_out       production minus the std output buffer (output-write cost)
  gemm_only     GEMM chain with no bias/ReLU (VPU-interlude cost)
  no_epi        member forwards but no s1/s2/stat epilogue (epilogue cost)
  members M     production at M in {1,2,4,8}: slope = per-member chain,
                intercept = fixed pass overhead
  layers L      production at L in {1,3,5,7} (timing-only truncation)

plus two targeted-fix candidates informed by the HBM ledger (the pass
moves 134 MB padded x in + 268 MB mean/std out for 5.2 MB of real input
and 2.1 MB of real output):

  xT            x streamed TRANSPOSED as a (8, tile) block — kills the
                separate (B,128) zero-pad op (134 MB write + 134 MB read)
                the model path pays before every pass
  xT+outT       additionally writes mean/std transposed as (8, tile)
                blocks via an on-MXU transpose (268 MB -> 16.8 MB writes)

Timing: 3 warmup + reps x trials group timing with host-fetch sync
(bench.py protocol).  Numerics of xT/outT variants are checked against
the production kernel before timing.

Usage: python experiments/grid_r5/attrib_eval.py [--batch N] [--reps R]
       [--interpret]   # CPU correctness mode, tiny shapes
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from nnueehcs_tpu.ops import fused_ensemble as fe


# ---------------------------------------------------------------------------
# ablation kernel: one body, compile-time flags carve pieces off
# ---------------------------------------------------------------------------
def ablate_kernel(x_ref, *refs, num_members, num_layers, relus,
                  mode, n_out):
    w_refs = refs[:num_layers]
    b_refs = refs[num_layers:2 * num_layers]
    outs = refs[2 * num_layers:2 * num_layers + n_out]

    x = x_ref[:]

    if mode == 'io_floor':
        # touch the input, write constants: DMA + grid latency only
        v = jnp.sum(x[:1, :1])
        for o in outs:
            o[:] = jnp.full(o.shape, 1.0, jnp.float32) + v
        return

    def member_forward(m, with_vpu=True):
        h = x
        for l in range(num_layers):
            h = jnp.dot(h, w_refs[l][m], preferred_element_type=jnp.float32)
            if with_vpu:
                h = h + b_refs[l][m]
                if relus[l]:
                    h = jnp.maximum(h, 0.0)
        return h

    with_vpu = mode != 'gemm_only'
    c = member_forward(0, with_vpu)
    if mode == 'no_epi':
        # member forwards without the shifted-stat accumulation; keep the
        # last member live so nothing dead-codes away
        h = c
        for m in range(1, num_members):
            h = member_forward(m, with_vpu)
        outs[0][:] = h
        if n_out > 1:
            outs[1][:] = c
        return
    s1 = jnp.zeros((x.shape[0], 128), jnp.float32)
    s2 = jnp.zeros((x.shape[0], 128), jnp.float32)
    for m in range(1, num_members):
        d = member_forward(m, with_vpu) - c
        s1 = s1 + d
        s2 = s2 + d * d
    mean, std = fe._shifted_stats(s1, s2, c, num_members)
    outs[0][:] = mean
    if n_out > 1:
        outs[1][:] = std


@functools.partial(jax.jit, static_argnames=('num_members', 'relus', 'tile',
                                             'mode', 'n_out', 'interpret'))
def ablate_forward(x_pad, ws, bs, num_members, relus, tile, mode,
                   n_out=2, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bpad, dpad = x_pad.shape
    num_layers = len(ws)
    in_specs = [pl.BlockSpec((tile, dpad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0,) * 3,
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,) * 2,
                                     memory_space=pltpu.VMEM))
    kernel = functools.partial(
        ablate_kernel, num_members=num_members, num_layers=num_layers,
        relus=relus, mode=mode, n_out=n_out)
    out_spec = pl.BlockSpec((tile, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bpad, 128), jnp.float32)
    outs = pl.pallas_call(
        kernel, grid=(bpad // tile,), in_specs=in_specs,
        out_specs=(out_spec,) * n_out, out_shape=(out_shape,) * n_out,
        interpret=interpret,
    )(x_pad, *ws, *bs)
    return outs


# ---------------------------------------------------------------------------
# targeted fix: transposed input (and optionally transposed outputs)
# ---------------------------------------------------------------------------
def xt_kernel(xt_ref, eye_ref, *refs, num_members, num_layers, relus,
              out_t):
    """x arrives TRANSPOSED as a (dpad_t, tile) block (dense 5-row slab —
    no 128-lane zero-padding op, 5.2 MB of true input instead of 134 MB).
    Layer 1 contracts over dim 0 of both operands, producing the usual
    (tile, 128) activation; the rest of the chain is production math.
    With ``out_t`` the mean/std columns are transposed back to (out_rows,
    tile) rows on the MXU (one (128,tile)x(tile->) pass each) so the HBM
    write is 16.8 MB instead of 268 MB."""
    w_refs = refs[:num_layers]
    b_refs = refs[num_layers:2 * num_layers]
    outs = refs[2 * num_layers:]

    xt = xt_ref[:]                                   # (dpad_t, tile)

    def member_forward(m):
        # (tile, 128) = xtT . W0 : contract the feature axis (dim 0 of
        # both) — Mosaic handles the transposed operand on the MXU
        h = jax.lax.dot_general(
            xt, w_refs[0][m][:xt.shape[0], :],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = h + b_refs[0][m]
        if relus[0]:
            h = jnp.maximum(h, 0.0)
        for l in range(1, num_layers):
            h = jnp.dot(h, w_refs[l][m], preferred_element_type=jnp.float32)
            h = h + b_refs[l][m]
            if relus[l]:
                h = jnp.maximum(h, 0.0)
        return h

    c = member_forward(0)
    s1 = jnp.zeros((xt.shape[1], 128), jnp.float32)
    s2 = jnp.zeros((xt.shape[1], 128), jnp.float32)
    for m in range(1, num_members):
        d = member_forward(m) - c
        s1 = s1 + d
        s2 = s2 + d * d
    mean, std = fe._shifted_stats(s1, s2, c, num_members)
    if not out_t:
        outs[0][:] = mean
        outs[1][:] = std
        return
    # transpose (tile, 128) -> (128, tile) on the MXU via the identity
    # (Iᵀ·M)ᵀ pattern: dot_general contracting mean's row axis with eye's
    # row axis yields meanᵀ
    eye = eye_ref[:]
    mt = jax.lax.dot_general(mean, eye,
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    st = jax.lax.dot_general(std, eye,
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    outs[0][:] = mt[:outs[0].shape[0], :]
    outs[1][:] = st[:outs[1].shape[0], :]


@functools.partial(jax.jit, static_argnames=('num_members', 'relus', 'tile',
                                             'out_t', 'out_rows',
                                             'interpret'))
def xt_forward(x_t, ws, bs, num_members, relus, tile, out_t=False,
               out_rows=8, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dpad_t, bpad = x_t.shape
    num_layers = len(ws)
    in_specs = [pl.BlockSpec((dpad_t, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, tile), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0,) * 3,
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,) * 2,
                                     memory_space=pltpu.VMEM))
    kernel = functools.partial(
        xt_kernel, num_members=num_members, num_layers=num_layers,
        relus=relus, out_t=out_t)
    if out_t:
        out_specs = (pl.BlockSpec((out_rows, tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM),) * 2
        out_shape = (jax.ShapeDtypeStruct((out_rows, bpad), jnp.float32),) * 2
    else:
        out_specs = (pl.BlockSpec((tile, 128), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM),) * 2
        out_shape = (jax.ShapeDtypeStruct((bpad, 128), jnp.float32),) * 2
    eye = jnp.eye(tile, dtype=jnp.float32)
    mean, std = pl.pallas_call(
        kernel, grid=(bpad // tile,), in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape, interpret=interpret,
    )(x_t, eye, *ws, *bs)
    return mean, std


# ---------------------------------------------------------------------------
def time_variant(fn, sync, reps, trials):
    for _ in range(3):
        sync(fn())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(trials):
            out = fn()
        sync(out)
        times.append((time.perf_counter() - t0) / trials)
    ts = sorted(times)
    trim = len(ts) // 5
    core = ts[trim:len(ts) - trim] if len(ts) > 2 * trim + 1 else ts
    med = float(np.median(times))
    return med, 100.0 * (core[-1] - core[0]) / med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=262144)
    ap.add_argument('--reps', type=int, default=11)
    ap.add_argument('--trials', type=int, default=10)
    ap.add_argument('--tile', type=int, default=1024)
    ap.add_argument('--interpret', action='store_true')
    args = ap.parse_args()
    interp = args.interpret
    if interp:
        jax.config.update('jax_platforms', 'cpu')
        args.batch = min(args.batch, 2048)
        args.tile = min(args.tile, 256)
        args.reps, args.trials = 1, 1

    from __graft_entry__ import _flagship
    model = _flagship(num_models=8)
    net, params, state = model.net, model.params, model.state
    folded = fe.fold_ensemble_params(net, params, state)
    M = folded[0][0].shape[0]
    L = len(folded)
    ws, bs, relus = fe._pad_folded(folded, M, compute_dtype=jnp.float32)
    ws = tuple(jax.device_put(w) for w in ws)
    bs = tuple(jax.device_put(b) for b in bs)
    relus = tuple(relus)
    dpad = ws[0].shape[1]
    tile = args.tile

    rng = np.random.default_rng(0)
    x = rng.normal(size=(args.batch, 5)).astype(np.float32)
    bpad = -(-args.batch // tile) * tile
    x_p = jnp.zeros((bpad, dpad), jnp.float32)
    x_p = x_p.at[:args.batch, :5].set(x)
    # transposed input slab: (8, bpad) — 8 sublane rows cover the 5
    # features, lanes are batch rows (dense, no 128-lane pad)
    x_t = jnp.zeros((8, bpad), jnp.float32)
    x_t = x_t.at[:5, :args.batch].set(x.T)

    def sync(out):
        o = out[0] if isinstance(out, (tuple, list)) else out
        np.asarray(o[:1, :1] if o.ndim == 2 else o[:1])

    # ---- numerics gate for the fix candidates -------------------------
    ref_m, ref_s = ablate_forward(x_p, ws, bs, M, relus, tile, 'prod',
                                  n_out=2, interpret=interp)
    ref_m = np.asarray(ref_m[:args.batch, :1])
    ref_s = np.asarray(ref_s[:args.batch, :1])
    if not interp:   # production kernel has no interpret knob
        base_m, _ = fe._fused_forward(x_p, ws, bs, M, relus, 1, tile)
        dm = np.max(np.abs(np.asarray(base_m[:args.batch]) - ref_m))
        print(f'# ablate-prod vs production: max|dmean|={dm:.2e}')
    for name, out_t in (('xT', False), ('xT+outT', True)):
        m, s = xt_forward(x_t, ws, bs, M, relus, tile, out_t=out_t,
                          interpret=interp)
        if out_t:
            m = np.asarray(m)[0, :args.batch, None]
            s = np.asarray(s)[0, :args.batch, None]
        else:
            m = np.asarray(m[:args.batch, :1])
            s = np.asarray(s[:args.batch, :1])
        dm = np.max(np.abs(m - ref_m))
        ds = np.max(np.abs(s - ref_s))
        print(f'# numerics {name}: max|dmean|={dm:.2e} max|dstd|={ds:.2e}')
        # outT routes mean/std through one extra MXU pass (the identity-
        # matmul transpose); TPU f32 GEMMs run as multi-pass bf16 on the
        # MXU, so that costs ~1 ulp of bf16³ accumulation (measured
        # 1.2e-4 abs on O(10) values on chip) — gate it at 1e-3, the
        # pure-layout xT variant stays at 1e-4
        tol = 1e-3 if out_t else 1e-4
        assert dm < tol and ds < tol, f'{name} numerics off'
    if interp:
        print('interpret-mode numerics OK')
        return

    # ---- the battery ---------------------------------------------------
    def abl(mode, n_out=2, m_=M, l_=L):
        w_, b_, r_ = ws[:l_], bs[:l_], relus[:l_]
        return lambda: ablate_forward(x_p, w_, b_, m_, r_, tile, mode,
                                      n_out=n_out)

    battery = [
        ('prod (ablate-harness control)', abl('prod')),
        ('io_floor (DMA+grid only)', abl('io_floor')),
        ('one_out (no std buffer)', abl('prod', n_out=1)),
        ('gemm_only (no bias/ReLU)', abl('gemm_only')),
        ('no_epi (no mean/std accum)', abl('no_epi')),
        ('members=1', abl('prod', m_=1)),
        ('members=2', abl('prod', m_=2)),
        ('members=4', abl('prod', m_=4)),
        ('layers=1', abl('prod', l_=1)),
        ('layers=3', abl('prod', l_=3)),
        ('layers=5', abl('prod', l_=5)),
        ('xT input', lambda: xt_forward(x_t, ws, bs, M, relus, tile)),
        ('xT+outT', lambda: xt_forward(x_t, ws, bs, M, relus, tile,
                                       out_t=True)),
    ]
    results = {}
    for name, fn in battery:
        try:
            med, spread = time_variant(fn, sync, args.reps, args.trials)
        except Exception as e:
            print(f'{name}: FAILED {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:100]}')
            continue
        results[name] = med
        print(f'{name}: {med * 1e3:.3f} ms/pass  '
              f'{args.batch / med / 1e6:.2f}M samples/s  '
              f'spread {spread:.1f}%')

    # ---- model-path control (includes the (B,128) zero-pad op) --------
    xj = jnp.asarray(x)
    fn_model = lambda: model(xj, return_ue=True)
    med, spread = time_variant(fn_model, sync, args.reps, args.trials)
    results['model path'] = med
    print(f'model path (pad op + kernel + slice): {med * 1e3:.3f} ms/pass  '
          f'{args.batch / med / 1e6:.2f}M samples/s  spread {spread:.1f}%')

    # ---- decomposition print -------------------------------------------
    if 'prod (ablate-harness control)' in results:
        p = results['prod (ablate-harness control)']
        print('\n# decomposition (ms, vs ablate-prod control '
              f'{p * 1e3:.3f} ms):')
        for k, label in [
                ('io_floor (DMA+grid only)', 'DMA+grid floor'),
                ('one_out (no std buffer)', 'minus one output'),
                ('gemm_only (no bias/ReLU)', 'minus VPU interludes'),
                ('no_epi (no mean/std accum)', 'minus epilogue'),
                ('xT input', 'fix: transposed input'),
                ('xT+outT', 'fix: transposed in+out'),
                ('model path', 'model path (total)')]:
            if k in results:
                print(f'#   {label:28s} {results[k] * 1e3:8.3f} ms  '
                      f'(delta {100 * (results[k] - p) / p:+.1f}%)')


if __name__ == '__main__':
    main()
