"""On-chip A/B of the production fused-ensemble input layouts.

Lands VERDICT r4 item 2's fix candidate: the r5 attribution battery
(attrib_eval*.out) measured the wide layout's 128-lane zero-pad op +
fat input DMA at +29.7% of the model path, and the probe xT kernel at
+12% end-to-end under loaded conditions.  This script times the REAL
user path (``model(x, return_ue=True)`` -> prepare_fused_weights ->
fused_forward_prefolded) with layout baked to 'wide' vs 'xt' at the
headline shape, and gates the xt numerics against wide on-chip first.

Usage: python experiments/grid_r5/xt_ab.py [--batch 262144] [--members 8]
Each layout runs in-process sequentially (separate caches), so chip
conditions are shared; the wide/xt ratio is the honest readout even if
absolute numbers drift with host load.
"""
import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=262144)
    ap.add_argument('--members', type=int, default=8)
    ap.add_argument('--reps', type=int, default=15)
    ap.add_argument('--trials', type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import _build_model, _spread
    from nnueehcs_tpu.ops import fused_ensemble as fe

    model = _build_model('ensemble', args.members)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(args.batch, 5)),
                    jnp.float32)

    caches = {
        layout: fe.prepare_fused_weights(model.net, model.params,
                                         model.state, layout=layout)
        for layout in ('wide', 'xt')}
    for layout, c in caches.items():
        assert c.folded, layout

    import jax
    fns = {layout: jax.jit(lambda xx, c=c: fe.fused_forward_prefolded(c, xx))
           for layout, c in caches.items()}

    # numerics gate on-chip
    ref = fns['wide'](x)
    got = fns['xt'](x)
    dm = float(jnp.max(jnp.abs(ref[0] - got[0])))
    ds = float(jnp.max(jnp.abs(ref[1] - got[1])))
    print(f'# numerics xt vs wide: max|dmean|={dm:.2e} max|dstd|={ds:.2e}',
          flush=True)
    assert dm == 0.0 and ds == 0.0, 'xt layout numerics mismatch'

    def sync(out):
        np.asarray(out[0][:1])
        np.asarray(out[1][:1])

    results = {}
    # interleave the two layouts rep-by-rep so host-load drift hits both
    for layout in ('wide', 'xt'):
        for _ in range(3):
            sync(fns[layout](x))
    times = {layout: [] for layout in fns}
    for _ in range(args.reps):
        for layout in ('wide', 'xt'):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.trials):
                out = fns[layout](x)
            sync(out)
            times[layout].append((time.perf_counter() - t0) / args.trials)
    for layout in ('wide', 'xt'):
        med = float(np.median(times[layout]))
        results[layout] = med
        sp = _spread(times[layout])
        print(f'{layout}: {med * 1e3:.3f} ms/pass  '
              f'{args.batch / med / 1e6:.2f}M samples/s  '
              f'spread {sp["spread_pct"]:.1f}% '
              f'(raw {sp["raw_spread_pct"]:.1f}%)', flush=True)
    print(f'# xt/wide speedup: {results["wide"] / results["xt"]:.3f}x')

    # HBM calibration: what streaming bandwidth does plain XLA achieve on
    # this chip for the same (B,128) f32 shapes?  One read + one write of
    # 134 MB each — if this lands near the io_floor's ~120 GB/s, the
    # kernel floor is the chip's effective streaming rate, not a Pallas
    # artifact; if it lands near the 819 GB/s spec, the kernel is leaving
    # bandwidth on the table.
    big = jnp.zeros((args.batch, 128), jnp.float32)
    add1 = jax.jit(lambda a: a + 1.0)
    for _ in range(3):
        np.asarray(add1(big)[:1])
    bw_times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.trials):
            out = add1(big)
        np.asarray(out[:1])
        bw_times.append((time.perf_counter() - t0) / args.trials)
    med = float(np.median(bw_times))
    traffic = 2 * big.size * 4
    sp = _spread(bw_times)
    print(f'# hbm calib (jit a+1, {traffic / 1e6:.0f} MB/pass): '
          f'{med * 1e3:.3f} ms -> {traffic / med / 1e9:.1f} GB/s  '
          f'spread {sp["spread_pct"]:.1f}% (raw {sp["raw_spread_pct"]:.1f}%)')


if __name__ == '__main__':
    main()
