"""Fused-ensemble eval kernel variants — round-4 perf experiment.

The r3 headline is the f32 fused kernel at 25M samples/s. Padded-FLOP
accounting says that is ~94% of the v5e *f32* MXU roofline (481 GFLOP
padded per 262k-row pass / 10.4 ms = 46 TFLOP/s vs ~49 TFLOP/s f32 peak)
— i.e. the kernel is compute-bound at f32 rate, and the untried lever
(VERDICT r3 item 4) is running the GEMM operands in bf16 (~4x MXU rate,
197 TFLOP/s peak). This script measures, on one chip:

  A  f32, tile 512 (the r3 headline path, control)
  B  bf16 GEMM operands, tile 512 (existing compute_dtype path)
  C  bf16, tile 1024 (half the grid steps, VMEM still fits)
  D  bf16, tile 512, packed single output (mean+std share one (B,128)
     f32 buffer -> halves the 268 MB/pass HBM write traffic)
  E  bf16, tile 1024, packed output
  F  f32, tile 1024 (control: is tile or dtype the lever?)

plus numerics: max |mean_bf16 - mean_f32| and std deviation vs the f32
path on the same weights.

Usage:  python experiments/grid_r4/kernel_variants.py [--batch N] [--reps R]
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


def packed_kernel(x_ref, *refs, num_members, num_layers, relus, out_dim,
                  compute_dtype='float32'):
    """Same math as fe._fused_kernel but mean/std are packed into ONE
    (tile, 128) f32 output: lanes [0:out_dim) = mean, [out_dim:2*out_dim)
    = std."""
    w_refs = refs[:num_layers]
    b_refs = refs[num_layers:2 * num_layers]
    out_ref = refs[2 * num_layers]

    cdt = jnp.dtype(compute_dtype)
    x = x_ref[:].astype(cdt)

    def member_forward(m):
        h = x
        for l in range(num_layers):
            h = jnp.dot(h, w_refs[l][m], preferred_element_type=jnp.float32)
            h = h + b_refs[l][m]
            if relus[l]:
                h = jnp.maximum(h, 0.0)
            if l + 1 < num_layers:
                h = h.astype(cdt)
        return h.astype(jnp.float32)

    c = member_forward(0)
    s1 = jnp.zeros((x.shape[0], 128), jnp.float32)
    s2 = jnp.zeros((x.shape[0], 128), jnp.float32)
    for m in range(1, num_members):
        d = member_forward(m) - c
        s1 = s1 + d
        s2 = s2 + d * d
    mean, std = fe._shifted_stats(s1, s2, c, num_members)
    col = jax.lax.broadcasted_iota(jnp.int32, mean.shape, 1)
    # std shifted up by out_dim lanes; mean in the low lanes
    std_shift = jnp.concatenate(
        [jnp.zeros((x.shape[0], out_dim), jnp.float32),
         std[:, :128 - out_dim]], axis=1)
    out_ref[:] = jnp.where(col < out_dim, mean, std_shift)


@functools.partial(jax.jit, static_argnames=('num_members', 'relus',
                                             'out_dim', 'tile',
                                             'compute_dtype'))
def packed_forward(x_pad, ws, bs, num_members, relus, out_dim, tile,
                   compute_dtype='float32'):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bpad, dpad = x_pad.shape
    num_layers = len(ws)
    grid = (bpad // tile,)
    in_specs = [pl.BlockSpec((tile, dpad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0,) * 3,
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,) * 2,
                                     memory_space=pltpu.VMEM))
    kernel = functools.partial(
        packed_kernel, num_members=num_members, num_layers=num_layers,
        relus=relus, out_dim=out_dim, compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, 128), jnp.float32),
    )(x_pad, *ws, *bs)
    return out[:, :out_dim], out[:, out_dim:2 * out_dim]


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
    ap.add_argument('--reps', type=int, default=15)
    ap.add_argument('--trials', type=int, default=10)
    ap.add_argument('--anchored', action='store_true',
                    help='also run the anchored fused-vs-vmap bench')
    args = ap.parse_args()
    if args.anchored:
        anchored_bench()
        return

    from __graft_entry__ import _flagship
    model = _flagship(num_models=8)
    net, params, state = model.net, model.params, model.state

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, 5)), jnp.float32)

    folded = fe.fold_ensemble_params(net, params, state)
    out_dim = folded[-1][0].shape[-1]
    M = folded[0][0].shape[0]

    def build(dtype):
        ws, bs, relus = fe._pad_folded(folded, M, compute_dtype=dtype)
        return ([jax.device_put(w) for w in ws],
                [jax.device_put(b) for b in bs], tuple(relus))

    ws32, bs32, relus = build(jnp.float32)
    ws16, bs16, _ = build(jnp.bfloat16)
    dpad = ws32[0].shape[1]

    bpad = -(-args.batch // 1024) * 1024
    x_p = jnp.zeros((bpad, dpad), jnp.float32)
    x_p = x_p.at[:args.batch, :x.shape[1]].set(x)

    def sync(out):
        np.asarray(out[0][:1])
        np.asarray(out[1][:1])

    def split_fn(ws, bs, tile, cdt, order='member'):
        return lambda: fe._fused_forward(x_p, tuple(ws), tuple(bs), M,
                                         relus, out_dim, tile,
                                         compute_dtype=cdt, order=order)

    # slim-first variants: first-layer input padded to 16 lanes, not 128 —
    # drops the first GEMM's padded FLOPs 8x and x_pad HBM traffic 8x
    ws32s, bs32s, _ = (lambda t: ([jax.device_put(w) for w in t[0]],
                                  [jax.device_put(b) for b in t[1]], t[2]))(
        fe._pad_folded(folded, M, compute_dtype=jnp.float32,
                       slim_first=True))
    dpad_s = ws32s[0].shape[1]
    x_ps = jnp.zeros((bpad, dpad_s), jnp.float32)
    x_ps = x_ps.at[:args.batch, :x.shape[1]].set(x)

    def slim_fn(tile, order):
        return lambda: fe._fused_forward(x_ps, tuple(ws32s), tuple(bs32s),
                                         M, relus, out_dim, tile,
                                         compute_dtype='float32',
                                         order=order)

    def packed_fn(ws, bs, tile, cdt):
        return lambda: packed_forward(x_p, tuple(ws), tuple(bs), M,
                                      relus, out_dim, tile,
                                      compute_dtype=cdt)

    variants = [
        ('A f32 t512 split', split_fn(ws32, bs32, 512, 'float32')),
        ('B bf16 t512 split', split_fn(ws16, bs16, 512, 'bfloat16')),
        ('C bf16 t1024 split', split_fn(ws16, bs16, 1024, 'bfloat16')),
        ('D bf16 t512 packed', packed_fn(ws16, bs16, 512, 'bfloat16')),
        ('E bf16 t1024 packed', packed_fn(ws16, bs16, 1024, 'bfloat16')),
        ('F f32 t1024 split', split_fn(ws32, bs32, 1024, 'float32')),
        ('G f32 t1024 packed', packed_fn(ws32, bs32, 1024, 'float32')),
        # round-4 s3: layer-outer interleave — per layer the M member
        # GEMMs are independent and issue back-to-back (the member-outer
        # kernel's serial chain leaves the MXU at ~27% of its measured
        # single-pass rate; A==B above shows dtype is NOT the bound)
        ('H f32 t512 layer-outer', split_fn(ws32, bs32, 512, 'float32',
                                            order='layer')),
        ('I bf16 t512 layer-outer', split_fn(ws16, bs16, 512, 'bfloat16',
                                             order='layer')),
        ('J f32 t1024 layer-outer', split_fn(ws32, bs32, 1024, 'float32',
                                             order='layer')),
        ('K f32 t512 layer-outer slim', slim_fn(512, 'layer')),
        ('L f32 t512 member slim', slim_fn(512, 'member')),
        # larger tiles: t512->t1024 nudged upward in both sweeps, so probe
        # the per-grid-step overhead hypothesis further (VMEM still fits:
        # x 2 MB + 8 live (4096,128) f32 activations 16 MB + weights 4 MB)
        ('M f32 t2048 split', split_fn(ws32, bs32, 2048, 'float32')),
        ('N f32 t4096 split', split_fn(ws32, bs32, 4096, 'float32')),
    ]

    # numerics first (also warms the compiles); a variant whose block
    # shape Mosaic rejects is reported and skipped, not fatal
    broken = set()
    ref_m, ref_s = variants[0][1]()
    ref_m, ref_s = np.asarray(ref_m[:args.batch]), np.asarray(ref_s[:args.batch])
    for name, fn in variants[1:]:
        try:
            m, s = fn()
            m, s = np.asarray(m[:args.batch]), np.asarray(s[:args.batch])
        except Exception as e:
            broken.add(name)
            print(f'# numerics {name}: FAILED {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:120]}')
            continue
        dm = np.max(np.abs(m - ref_m)) / (np.max(np.abs(ref_m)) + 1e-30)
        ds = np.max(np.abs(s - ref_s)) / (np.max(np.abs(ref_s)) + 1e-30)
        print(f'# numerics {name}: rel max |dmean|={dm:.2e} |dstd|={ds:.2e}')

    for name, fn in variants:
        if name in broken:
            continue
        med, spread = time_variant(fn, sync, args.reps, args.trials)
        tp = args.batch / med
        print(f'{name}: {med * 1e3:.3f} ms/pass  {tp / 1e6:.2f}M samples/s  '
              f'spread {spread:.1f}%')


def anchored_bench(batch=65536, anchors=229, reps=7, trials=5):
    """Anchored eval: fused kernel vs the vmap path at the bench.py
    delta_uq workload shape (the flagship cell's cost driver)."""
    from nnueehcs_tpu.model_builder import DeltaUQMLPModelBuilder
    from nnueehcs_tpu.ops import fused_anchored as fa
    arch = [{'Linear': {'args': [5, 128]}},
            {'BatchNorm1d': {'args': [128]}}, {'ReLU': {}}]
    for _ in range(5):
        arch += [{'Linear': {'args': [128, 128]}},
                 {'BatchNorm1d': {'args': [128]}}, {'ReLU': {}}]
    arch.append({'Linear': {'args': [128, 1]}})
    model = DeltaUQMLPModelBuilder(
        arch, {'estimator': 'std', 'num_anchors': anchors,
               'anchored_batch_size': anchors},
        train_config={'loss': 'l1_loss'}).build()
    rng = np.random.default_rng(2)
    model.anchors = rng.normal(size=(anchors, 5)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(batch, 5)), jnp.float32)

    def sync(out):
        np.asarray(out[0][:1]); np.asarray(out[1][:1])

    # vmap path (fused disabled)
    import os
    os.environ['NNUEEHCS_TPU_NO_FUSED'] = '1'
    fn_vmap = lambda: model(x, return_ue=True)
    med_v, spread_v = time_variant(fn_vmap, sync, reps, trials)
    del os.environ['NNUEEHCS_TPU_NO_FUSED']

    # fused kernel (f32 and bf16)
    model.invalidate_cache()
    fn_fused = lambda: model(x, return_ue=True)
    med_f, spread_f = time_variant(fn_fused, sync, reps, trials)
    assert getattr(model, '_fused_cache', None) is not None \
        and model._fused_cache.folded, 'fused anchored path did not engage'

    model.set_precision('bf16-mixed')
    model.anchors = rng.normal(size=(anchors, 5)).astype(np.float32)
    model.invalidate_cache()
    med_b, spread_b = time_variant(fn_fused, sync, reps, trials)

    ar = batch * anchors
    for name, med, sp in [('vmap', med_v, spread_v),
                          ('fused f32', med_f, spread_f),
                          ('fused bf16', med_b, spread_b)]:
        print(f'anchored {name}: {med * 1e3:.2f} ms/pass  '
              f'{batch / med / 1e6:.2f}M samples/s  '
              f'{ar / med / 1e6:.0f}M anchored rows/s  spread {sp:.1f}%')

    # numerics fused f32 vs vmap at this shape
    model.set_precision('32-true')
    model.anchors = np.asarray(model.anchors, np.float32)
    model.invalidate_cache()
    os.environ['NNUEEHCS_TPU_NO_FUSED'] = '1'
    rm, rs = model(x[:8192], return_ue=True)
    del os.environ['NNUEEHCS_TPU_NO_FUSED']
    model.invalidate_cache()
    fm, fs = model(x[:8192], return_ue=True)
    dm = float(np.max(np.abs(np.asarray(fm) - np.asarray(rm))))
    ds = float(np.max(np.abs(np.asarray(fs) - np.asarray(rs))))
    print(f'# anchored numerics fused-f32 vs vmap: max|dmean|={dm:.2e} '
          f'max|dstd|={ds:.2e}')


if __name__ == '__main__':
    main()
