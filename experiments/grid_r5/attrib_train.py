"""Fused-epoch training kernel: decompose the 45 us/step budget.

VERDICT r4 weak #2 / next-round item 5: training-path MFU is 5.7%
(ensemble) / 2.0% (MC dropout) at the reference's batch-128 shape; the
speed-of-light compute for one step is ~2.6 us, so ~94% of the measured
45 us is overhead nobody has attributed.  This script times ablated
variants of ``ops/fused_train._epoch_kernel`` at the flagship shape
(8 members, 7x128 MLP, batch 128, 500 steps/epoch):

  prod       ablation-harness control (same math as the library kernel)
  no_opt     skip clip-by-global-norm + Adam + weight decay
  no_bwd     loss sweep only (M forwards + loss, no backward, no opt)
  fwd1       ONE member's forward + loss only
  empty      write the loss row only (grid + batch-DMA floor)

The deltas give the per-step budget: bwd+opt = prod-no_bwd minus opt;
opt = prod-no_opt; fwd sweep = no_bwd-empty; floor = empty.

Fix candidates (timed only when they compile; numerics asserted vs prod):

  unroll K   K batches per grid step (grid S/K, (K,B,d) blocks): K-1 of
             every K grid-step latencies amortised, math IDENTICAL
             (full fwd/bwd/opt per sub-batch, in order)
  gn_fused   global grad-norm accumulated as the backward writes grads
             (kills the separate read-sweep over the grad buffer)
  ch4096     optimizer row-chunk 1024 -> 4096 (fewer, larger VPU ops)

plus batch scaling (prod at B in {128, 256, 512, 1024}) to check the
docs/BENCHMARKS.md claim that >=20% MFU needs batch 512-1024.

Usage: python experiments/grid_r5/attrib_train.py [--steps N] [--reps R]
       [--interpret]    # CPU numerics mode, tiny shapes
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from nnueehcs_tpu.ops import fused_train as ft


# ---------------------------------------------------------------------------
# the ablation kernel: fused_train._epoch_kernel with carve-out flags and
# the dropout machinery removed (the flagship ensemble chain has none)
# ---------------------------------------------------------------------------
def ablate_epoch_kernel(plan, mode, unroll, gn_fused, opt_chunk,
                        lr_ref, step0_ref, x_ref, y_ref,
                        th_in, m_in, v_in, sg_in,
                        th_out, m_out, v_out, sg_out, loss_ref,
                        th_s, m_s, v_s, g_s, sg_s, zh_s, inv_s, sem):
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
        g_s[:] = jnp.zeros_like(g_s)

    def mm(a_, b_, dims=(((1,), (0,)), ((), ()))):
        return jax.lax.dot_general(a_, b_, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    def one_step(u, gn2_init):
        # u may be traced (fori_loop below) — slice with pl.ds
        x = x_ref[pl.ds(u, 1)][0]
        y = y_ref[pl.ds(u, 1)][0].astype(jnp.float32)
        ypad = jnp.concatenate(
            [y, jnp.zeros((B, 128 - plan.out_pad), jnp.float32)], axis=1)

        def forward(m, update_ema, save_zhat):
            base = m * plan.slab_rows
            sbase = m * plan.sig_rows
            h = x.astype(jnp.float32)
            for L in lins:
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

        if mode == 'empty':
            return jnp.sum(x[:1, :1]), gn2_init
        if mode == 'fwd1':
            h = forward(0, update_ema=True, save_zhat=False)
            term, _ = ft._loss_and_grad(plan, h, ypad)
            return term / ft._loss_div(plan), gn2_init

        # joint-mean loss sweep (the flagship config couples members)
        predsum = None
        for m in range(M):
            h = forward(m, update_ema=True, save_zhat=False)
            predsum = h if predsum is None else predsum + h
        predm = predsum * (1.0 / M)
        term, dpred = ft._loss_and_grad(plan, predm, ypad)
        loss_t = term / ft._loss_div(plan)
        if mode == 'no_bwd':
            return loss_t, gn2_init
        dpred = dpred * (1.0 / M)

        gn2 = gn2_init
        for m in range(M):
            base = m * plan.slab_rows
            forward(m, update_ema=False, save_zhat=True)
            d = dpred
            for li in range(len(lins) - 1, -1, -1):
                L = lins[li]
                if L.relu:
                    act = zh_s[L.zh_idx, :, :] \
                        * th_s[base + L.g_off, :][None, :] \
                        + th_s[base + L.be_off, :][None, :]
                    d = d * (act > 0.0).astype(jnp.float32)
                if L.bn_layer >= 0:
                    zh = zh_s[L.zh_idx, :, :]
                    gg = jnp.sum(d * zh, axis=0)
                    gb = jnp.sum(d, axis=0)
                    g_s[base + L.g_off, :] = gg
                    g_s[base + L.be_off, :] = gb
                    if gn_fused:
                        gn2 = gn2 + jnp.sum(gg * gg) + jnp.sum(gb * gb)
                    dzh = d * th_s[base + L.g_off, :][None, :]
                    s1 = jnp.sum(dzh, axis=0)
                    s2 = jnp.sum(dzh * zh, axis=0)
                    inv = inv_s[L.zh_idx, :]
                    d = (inv[None, :] / B) * (B * dzh - s1[None, :]
                                              - zh * s2[None, :])
                if li == 0:
                    a = x.astype(jnp.float32)
                else:
                    P = lins[li - 1]
                    a = zh_s[P.zh_idx, :, :] \
                        * th_s[base + P.g_off, :][None, :] \
                        + th_s[base + P.be_off, :][None, :]
                    if P.relu:
                        a = jnp.maximum(a, 0.0)
                dW = mm(a, d, (((0,), (0,)), ((), ())))
                g_s[base + L.w_off:base + L.w_off + L.in_rows, :] = dW
                gb2 = jnp.sum(d, axis=0)
                g_s[base + L.b_off, :] = gb2
                if gn_fused:
                    gn2 = gn2 + jnp.sum(dW * dW) + jnp.sum(gb2 * gb2)
                if li > 0:
                    W = th_s[base + L.w_off:base + L.w_off + L.in_rows, :]
                    d = mm(d, W, (((1,), (1,)), ((), ())))

        if mode == 'no_opt':
            return loss_t, gn2

        # optimizer
        R = plan.total_rows
        CH = opt_chunk
        if plan.clip is not None:
            if not gn_fused:
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
        t = (step0_ref[0, 0] + i * unroll + u + 1).astype(jnp.float32)
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
            uu = (mn / c1) / (jnp.sqrt(vn / c2) + plan.adam_eps)
            if plan.weight_decay:
                uu = uu + plan.weight_decay * th_s[r0:r1, :]
            th_s[r0:r1, :] = th_s[r0:r1, :] - lr * uu
        return loss_t, jnp.float32(0.0)

    if unroll == 1:
        loss_t, _ = one_step(0, jnp.float32(0.0))
        loss_ref[pl.ds(i, 1), :] = jnp.full((1, 128), loss_t, jnp.float32)
    else:
        # fori_loop (NOT a Python unroll): one body, so Mosaic reuses the
        # step's stack temporaries — a 4x-unrolled Python loop quadruples
        # live stack and blows the ~16 MB VMEM (measured: 19.1M at K=4).
        # The grid-overhead amortisation being measured is unchanged: one
        # grid step (one in-block DMA) still covers K batches.
        def _body(u, _):
            loss_t, _ = one_step(u, jnp.float32(0.0))
            loss_ref[pl.ds(i * unroll + u, 1), :] = jnp.full(
                (1, 128), loss_t, jnp.float32)
            return 0
        jax.lax.fori_loop(0, unroll, _body, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _store():
        for src, dst in ((th_s, th_out), (m_s, m_out), (v_s, v_out),
                         (sg_s, sg_out)):
            dma = pltpu.make_async_copy(src, dst, sem)
            dma.start()
            dma.wait()


@functools.partial(jax.jit,
                   static_argnames=('plan', 'mode', 'unroll', 'gn_fused',
                                    'opt_chunk', 'interpret'))
def ablate_epoch(plan, theta, m, v, sigma, xs, ys, lr, step0,
                 mode='prod', unroll=1, gn_fused=False, opt_chunk=1024,
                 interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = xs.shape[0]
    assert S % unroll == 0
    R, G = plan.total_rows, plan.total_sig_rows
    kernel = functools.partial(ablate_epoch_kernel, plan, mode, unroll,
                               gn_fused, opt_chunk)
    flat = pl.BlockSpec(memory_space=pl.ANY)
    smem_scalar = pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
    theta, m, v, sigma, losses = pl.pallas_call(
        kernel,
        grid=(S // unroll,),
        in_specs=[
            smem_scalar, smem_scalar,
            pl.BlockSpec((unroll, plan.batch, plan.in_pad),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((unroll, plan.batch, plan.out_pad),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            flat, flat, flat, flat,
        ],
        out_specs=[flat, flat, flat, flat,
                   pl.BlockSpec((S, 128), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((R, 128), jnp.float32),
            jax.ShapeDtypeStruct((G, 128), jnp.float32),
            jax.ShapeDtypeStruct((S, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((plan.n_bn, plan.batch, 128), jnp.float32),
            pltpu.VMEM((plan.n_bn, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={4: 0, 5: 1, 6: 2, 7: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=ft._VMEM_BUDGET + 2 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(lr, jnp.float32).reshape(1, 1),
      jnp.asarray(step0, jnp.int32).reshape(1, 1),
      xs, ys, theta, m, v, sigma)
    return theta, m, v, sigma, losses[:, 0]


# ---------------------------------------------------------------------------
def build_problem(num_members=8, batch=128, steps=500, width=128, d=5,
                  hidden=6, seed=0):
    from nnueehcs_tpu.model_builder import EnsembleModelBuilder
    arch = [{'Linear': {'args': [d, width]}},
            {'BatchNorm1d': {'args': [width]}}, {'ReLU': {}}]
    for _ in range(hidden - 1):
        arch += [{'Linear': {'args': [width, width]}},
                 {'BatchNorm1d': {'args': [width]}}, {'ReLU': {}}]
    arch.append({'Linear': {'args': [width, 1]}})
    model = EnsembleModelBuilder(arch, {'num_models': num_members},
                                 train_config={'loss': 'l1_loss'}).build()
    plan = ft.plan_fused_train(model.net, num_members, batch,
                               loss='l1_loss', clip=5.0)
    assert plan is not None, 'flagship chain must be fusable'
    theta = ft.pack_tree(plan, model.params)
    mm_ = jnp.zeros_like(theta)
    vv = jnp.zeros_like(theta)
    sigma = ft.pack_state(plan, model.state)
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.normal(size=(steps, batch, plan.in_pad)),
                     jnp.float32)
    ys = jnp.asarray(rng.normal(size=(steps, batch, plan.out_pad)),
                     jnp.float32)
    return plan, theta, mm_, vv, sigma, xs, ys


def time_epoch(fn, reps):
    out = fn()
    np.asarray(out[0][:1, :1])          # warm compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0][:1, :1])
        times.append(time.perf_counter() - t0)
    ts = sorted(times)
    trim = len(ts) // 5
    core = ts[trim:len(ts) - trim] if len(ts) > 2 * trim + 1 else ts
    med = float(np.median(times))
    return med, 100.0 * (core[-1] - core[0]) / med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=500)
    ap.add_argument('--reps', type=int, default=9)
    ap.add_argument('--interpret', action='store_true')
    args = ap.parse_args()
    interp = args.interpret
    if interp:
        jax.config.update('jax_platforms', 'cpu')
        args.steps, args.reps = 8, 1

    plan, theta, m0, v0, sg0, xs, ys = build_problem(steps=args.steps)
    S, B = args.steps, plan.batch

    def run(mode='prod', unroll=1, gn_fused=False, opt_chunk=1024,
            plan_=None, theta_=None, xs_=None, ys_=None):
        p = plan_ or plan
        th = theta_ if theta_ is not None else theta
        x_ = xs_ if xs_ is not None else xs
        y_ = ys_ if ys_ is not None else ys
        # sigma layout depends only on the arch, not the batch — sg0 is
        # valid for every plan this script builds
        return lambda: ablate_epoch(
            p, th, jnp.zeros_like(th), jnp.zeros_like(th), sg0,
            x_, y_, 1e-3, 0, mode=mode, unroll=unroll, gn_fused=gn_fused,
            opt_chunk=opt_chunk, interpret=interp)

    # ---- numerics: ablate-prod and every fix must match the library ----
    # the library jit donates theta/m/v/sigma — pass throwaway copies
    lib = ft.fused_epoch(plan, theta.copy(), m0.copy(), v0.copy(),
                         sg0.copy(), xs, ys, 1e-3, 0, interpret=interp)
    ref_th, ref_loss = np.asarray(lib[0]), np.asarray(lib[4])
    bad = set()
    for name, kw in [('prod', {}), ('unroll4', {'unroll': 4}),
                     ('gn_fused', {'gn_fused': True}),
                     ('ch4096', {'opt_chunk': 4096})]:
        try:
            out = run(**kw)()
            dth = np.max(np.abs(np.asarray(out[0]) - ref_th))
            dls = np.max(np.abs(np.asarray(out[4]) - ref_loss))
        except Exception as e:
            print(f'# numerics {name}: FAILED {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:100]}')
            bad.add(name)
            continue
        print(f'# numerics {name} vs library: max|dtheta|={dth:.2e} '
              f'max|dloss|={dls:.2e}')
        if not (dth < 1e-5 and dls < 1e-6):
            print(f'# {name} DIVERGES from library — excluded from battery')
            bad.add(name)
    assert 'prod' not in bad, 'ablation control itself broken'
    if interp:
        print('interpret-mode numerics OK')
        return

    # ---- library control + ablation battery ----------------------------
    def lib_fn():
        return ft.fused_epoch(plan, theta.copy(), jnp.zeros_like(theta),
                              jnp.zeros_like(theta), sg0.copy(), xs, ys,
                              1e-3, 0)
    rows = S * B
    battery = [
        ('library fused_epoch', lib_fn),
        ('prod (ablate control)', run()),
        ('no_opt', run('no_opt')),
        ('no_bwd (loss sweep only)', run('no_bwd')),
        ('fwd1 (one member fwd)', run('fwd1')),
        ('empty (grid+DMA floor)', run('empty')),
        ('fix: unroll4', run(unroll=4)),
        ('fix: unroll8', run(unroll=8)),
        ('fix: gn_fused', run(gn_fused=True)),
        ('fix: ch4096', run(opt_chunk=4096)),
        ('fix: unroll4+gn+ch4096', run(unroll=4, gn_fused=True,
                                       opt_chunk=4096)),
    ]
    results = {}
    for name, fn in battery:
        if any(b in name for b in bad):
            print(f'{name}: SKIPPED (failed the numerics gate)')
            continue
        try:
            med, spread = time_epoch(fn, args.reps)
        except Exception as e:
            print(f'{name}: FAILED {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:100]}')
            continue
        results[name] = med
        print(f'{name}: {med * 1e3:.2f} ms/epoch  '
              f'{med / S * 1e6:.1f} us/step  {rows / med / 1e6:.2f}M rows/s'
              f'  spread {spread:.1f}%')

    if 'prod (ablate control)' in results:
        p = results['prod (ablate control)']
        print(f'\n# per-step budget (prod {p / S * 1e6:.1f} us):')
        parts = [('empty (grid+DMA floor)', 'grid+DMA floor'),
                 ('fwd1 (one member fwd)', '1-member fwd+loss'),
                 ('no_bwd (loss sweep only)', 'M-member loss sweep'),
                 ('no_opt', 'fwd+bwd (no optimizer)')]
        for k, label in parts:
            if k in results:
                print(f'#   {label:26s} {results[k] / S * 1e6:7.1f} us/step'
                      f'  ({100 * results[k] / p:.0f}% of prod)')

    # ---- batch scaling (the >=20%-MFU-needs-batch-512 claim) -----------
    print('\n# batch scaling (prod math, 500 steps):')
    for Bs in (128, 256, 512, 1024):
        pl_, th_, _, _, _, xs_, ys_ = build_problem(batch=Bs,
                                                    steps=args.steps)
        fn = run(plan_=pl_, theta_=th_, xs_=xs_, ys_=ys_)
        try:
            med, spread = time_epoch(fn, max(3, args.reps // 2))
        except Exception as e:
            print(f'B={Bs}: FAILED {type(e).__name__}')
            continue
        r = args.steps * Bs / med
        # fwd + ~2x-fwd backward GEMM FLOPs, true (unpadded) MACs
        flops = 3 * 2 * 82688 * 8 * Bs * args.steps
        mfu = flops / med / 197e12
        print(f'B={Bs}: {med / args.steps * 1e6:6.1f} us/step  '
              f'{r / 1e6:5.2f}M rows/s  MFU {100 * mfu:.1f}%  '
              f'spread {spread:.1f}%')


if __name__ == '__main__':
    main()
