"""Follow-up probe to attrib_eval.py: turn the decomposition into a fix.

The session-3 battery (attrib_eval.out) showed, under clean chip
conditions (spreads 2-10%):

  io_floor = 65% of the pass (3.39 of 5.18 ms).  402 MB moved in
  3.39 ms is ~120 GB/s — far under the v5e's ~819 GB/s HBM, so the
  floor is NOT bandwidth; it smells like fixed per-grid-step overhead
  (256 steps x ~13 us).  The model path pays +29.7% on top of the
  kernel for the 128-lane pad op + output slices.

This probe tests the three candidate fixes those numbers imply:

  tile scaling   io_floor + prod at tile {512,1024,2048,4096}: if the
                 floor is per-step overhead it halves with the step
                 count; the noisy r4 sweep (tile 512 "best") gets a
                 clean-conditions retest.
  narrow lanes   HBM in/out arrays carry 8 lanes instead of 128
                 (x as (B,8), mean/std as (B,8)): the pad/slice ops
                 shrink 16x (134->8.4 MB each way) and the kernel's
                 DMA per step drops 16x, with NO in-kernel transpose
                 (Mosaic masks the lane remainder on load/store).
  xT end-to-end  the session-3 xT kernel wrapped the way the model
                 path would actually run it: jit(pad-transpose ->
                 kernel -> row-slice), timed against the model-path
                 control (6.715 ms / 39.0M samples/s).

Every variant is numerics-gated against the production kernel before
timing.  Usage: python experiments/grid_r5/attrib_eval2.py
[--batch N] [--reps R] [--interpret]
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
from attrib_eval import ablate_forward, xt_forward, time_variant  # noqa: E402


# ---------------------------------------------------------------------------
# narrow-lane kernel: HBM x is (B, 8) and mean/std are (B, 8); only the
# pad/slice and per-step DMA widths change — the math is the production
# member-order chain
# ---------------------------------------------------------------------------
def narrow_kernel(x_ref, *refs, num_members, num_layers, relus,
                  narrow_in, narrow_out):
    w_refs = refs[:num_layers]
    b_refs = refs[num_layers:2 * num_layers]
    mean_ref, std_ref = refs[2 * num_layers:2 * num_layers + 2]

    x = x_ref[:]                     # (tile, 8) or (tile, 128)

    def member_forward(m):
        w0 = w_refs[0][m]
        if narrow_in:
            w0 = w0[:x.shape[1], :]  # contract the true 8 sublanes
        h = jnp.dot(x, w0, preferred_element_type=jnp.float32)
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
    s1 = jnp.zeros((x.shape[0], 128), jnp.float32)
    s2 = jnp.zeros((x.shape[0], 128), jnp.float32)
    for m in range(1, num_members):
        d = member_forward(m) - c
        s1 = s1 + d
        s2 = s2 + d * d
    mean, std = fe._shifted_stats(s1, s2, c, num_members)
    if narrow_out:
        mean_ref[:] = mean[:, :mean_ref.shape[1]]
        std_ref[:] = std[:, :std_ref.shape[1]]
    else:
        mean_ref[:] = mean
        std_ref[:] = std


@functools.partial(jax.jit, static_argnames=('num_members', 'relus', 'tile',
                                             'narrow_in', 'narrow_out',
                                             'interpret'))
def narrow_forward(x_in, ws, bs, num_members, relus, tile,
                   narrow_in=True, narrow_out=True, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bpad, din = x_in.shape
    num_layers = len(ws)
    in_specs = [pl.BlockSpec((tile, din), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in ws:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0,) * 3,
                                     memory_space=pltpu.VMEM))
    for b in bs:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,) * 2,
                                     memory_space=pltpu.VMEM))
    kernel = functools.partial(
        narrow_kernel, num_members=num_members, num_layers=num_layers,
        relus=relus, narrow_in=narrow_in, narrow_out=narrow_out)
    owidth = 8 if narrow_out else 128
    out_spec = pl.BlockSpec((tile, owidth), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bpad, owidth), jnp.float32)
    mean, std = pl.pallas_call(
        kernel, grid=(bpad // tile,), in_specs=in_specs,
        out_specs=(out_spec,) * 2, out_shape=(out_shape,) * 2,
        interpret=interpret,
    )(x_in, *ws, *bs)
    return mean, std


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=262144)
    ap.add_argument('--reps', type=int, default=9)
    ap.add_argument('--trials', type=int, default=10)
    ap.add_argument('--interpret', action='store_true')
    args = ap.parse_args()
    interp = args.interpret
    if interp:
        jax.config.update('jax_platforms', 'cpu')
        args.batch = 2048
        args.reps, args.trials = 1, 1

    from __graft_entry__ import _flagship
    model = _flagship(num_models=8)
    net, params, state = model.net, model.params, model.state
    folded = fe.fold_ensemble_params(net, params, state)
    M = folded[0][0].shape[0]
    ws, bs, relus = fe._pad_folded(folded, M, compute_dtype=jnp.float32)
    ws = tuple(jax.device_put(w) for w in ws)
    bs = tuple(jax.device_put(b) for b in bs)
    relus = tuple(relus)
    dpad = ws[0].shape[1]

    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(args.batch, 5)).astype(np.float32)
    x = jnp.asarray(x_np)
    B = args.batch

    def pads_for(tile):
        bpad = -(-B // tile) * tile
        x_p = jnp.zeros((bpad, dpad), jnp.float32).at[:B, :5].set(x)
        return bpad, jax.device_put(x_p)

    def sync(out):
        if isinstance(out, (tuple, list)):
            np.asarray(out[0].ravel()[:1])
            np.asarray(out[-1].ravel()[:1])
        else:
            np.asarray(out.ravel()[:1])

    # --- reference output for numerics gates (production kernel, tile 1024)
    bpad0, x_p0 = pads_for(1024)
    ref_mean, ref_std = ablate_forward(x_p0, ws, bs, M, relus, 1024, 'prod',
                                       interpret=interp)
    ref_mean = np.asarray(ref_mean[:B, :1])
    ref_std = np.asarray(ref_std[:B, :1])

    # --- narrow-lane inputs
    x_n8 = jnp.zeros((bpad0, 8), jnp.float32).at[:B, :5].set(x)

    def gate(name, mean, std, tol=1e-4):
        dm = float(np.abs(np.asarray(mean[:B]).reshape(B, -1)[:, :1]
                          - ref_mean).max())
        ds = float(np.abs(np.asarray(std[:B]).reshape(B, -1)[:, :1]
                          - ref_std).max())
        print(f'# numerics {name}: max|dmean|={dm:.2e} max|dstd|={ds:.2e}'
              + ('  ** FAIL **' if max(dm, ds) > tol else ''))
        return max(dm, ds) <= tol

    battery = []

    # 1) tile scaling, io_floor + prod
    for tile in (512, 1024, 2048, 4096):
        bp, xp = pads_for(tile)
        battery.append((f'io_floor t{tile}',
                        functools.partial(ablate_forward, xp, ws, bs, M,
                                          relus, tile, 'io_floor',
                                          interpret=interp), None))
        battery.append((f'prod t{tile}',
                        functools.partial(ablate_forward, xp, ws, bs, M,
                                          relus, tile, 'prod',
                                          interpret=interp), 'wide'))

    # 2) narrow lanes (in, out, both) at tile 1024 and 2048
    for tile in (1024, 2048):
        bp, xp = pads_for(tile)
        xn = jnp.zeros((bp, 8), jnp.float32).at[:B, :5].set(x)
        battery.append((f'narrow-in t{tile}',
                        functools.partial(narrow_forward, xn, ws, bs, M,
                                          relus, tile, narrow_in=True,
                                          narrow_out=False,
                                          interpret=interp), 'wide'))
        battery.append((f'narrow-out t{tile}',
                        functools.partial(narrow_forward, xp, ws, bs, M,
                                          relus, tile, narrow_in=False,
                                          narrow_out=True,
                                          interpret=interp), 'narrow'))
        battery.append((f'narrow-both t{tile}',
                        functools.partial(narrow_forward, xn, ws, bs, M,
                                          relus, tile, narrow_in=True,
                                          narrow_out=True,
                                          interpret=interp), 'narrow'))

    # 3) end-to-end candidates: jit(pad -> kernel -> slice) from the raw
    #    (B, 5) input, exactly what fused_forward_prefolded would do
    @functools.partial(jax.jit, static_argnames=('tile',))
    def e2e_prod(xr, tile):
        bp = -(-xr.shape[0] // tile) * tile
        xp = jnp.zeros((bp, dpad), jnp.float32).at[:xr.shape[0], :5].set(xr)
        mean, std = ablate_forward(xp, ws, bs, M, relus, tile, 'prod')
        return mean[:xr.shape[0], :1], std[:xr.shape[0], :1]

    @functools.partial(jax.jit, static_argnames=('tile',))
    def e2e_narrow(xr, tile):
        bp = -(-xr.shape[0] // tile) * tile
        xn = jnp.zeros((bp, 8), jnp.float32).at[:xr.shape[0], :5].set(xr)
        mean, std = narrow_forward(xn, ws, bs, M, relus, tile,
                                   narrow_in=True, narrow_out=True)
        return mean[:xr.shape[0], :1], std[:xr.shape[0], :1]

    @functools.partial(jax.jit, static_argnames=('tile',))
    def e2e_xt(xr, tile):
        bp = -(-xr.shape[0] // tile) * tile
        xt = jnp.zeros((8, bp), jnp.float32).at[:5, :xr.shape[0]].set(xr.T)
        mean, std = xt_forward(xt, ws, bs, M, relus, tile)
        return mean[:xr.shape[0], :1], std[:xr.shape[0], :1]

    for tile in (1024, 2048):
        battery.append((f'e2e prod t{tile}',
                        functools.partial(e2e_prod, x, tile=tile), 'e2e'))
        battery.append((f'e2e narrow t{tile}',
                        functools.partial(e2e_narrow, x, tile=tile), 'e2e'))
    battery.append(('e2e xT t1024',
                    functools.partial(e2e_xt, x, tile=1024), 'e2e'))

    results = {}
    for name, fn, kind in battery:
        try:
            out = fn()
            if kind == 'wide':
                ok = gate(name, out[0], out[1])
            elif kind == 'narrow':
                ok = gate(name, out[0], out[1])
            elif kind == 'e2e':
                ok = gate(name, out[0], out[1])
            else:
                ok = True
            med, spread = time_variant(fn, sync, args.reps, args.trials)
            results[name] = med
            print(f'{name}: {med * 1e3:.3f} ms/pass  '
                  f'{B / med / 1e6:.2f}M samples/s  spread {spread:.1f}%'
                  + ('' if ok else '  [NUMERICS FAIL]'), flush=True)
        except Exception as e:
            print(f'{name}: FAILED {type(e).__name__}: {str(e)[:200]}',
                  flush=True)

    print('\n# io_floor per-step overhead model: t_floor(tile) vs steps')
    for tile in (512, 1024, 2048, 4096):
        k = f'io_floor t{tile}'
        if k in results:
            steps = -(-B // tile)
            print(f'#   tile {tile}: {results[k] * 1e3:.3f} ms '
                  f'/ {steps} steps = {results[k] / steps * 1e6:.1f} us/step')


if __name__ == '__main__':
    main()
