#!/usr/bin/env python
"""Micro-benchmark the fused level kernel fwd/bwd at various tile sizes.

Times the flagship-config fused_level forward and backward in isolation on
the attached TPU (bs rays x samples points), printing ms per call. Used to
pick pallas_tile / pallas_bwd_tile / tmpl_bwd_tile defaults.

  python tools/bench_kernels.py --samples 128 --tiles 1024 --bwd 256,512 \
      --tmpl 512,768
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rays', type=int, default=8192)
    ap.add_argument('--samples', type=int, default=128)
    ap.add_argument('--tiles', default='1024')
    ap.add_argument('--bwd', default='256')
    ap.add_argument('--tmpl', default='512')
    ap.add_argument('--cond_samples', type=int, default=-1,
                    help='-1 = samples (per-ray conds), 0 = per-point')
    ap.add_argument('--reps', type=int, default=20)
    ap.add_argument('--pipe', default='none',
                    help="comma list from {none,bwd,fwd,both}: the "
                         "software-pipelined kernel variants to sweep")
    args = ap.parse_args()

    from hypernerf_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hypernerf_tpu.ops.pallas.fused_level import (FusedLevelSpec,
                                                      fused_level)

    assert jax.default_backend() == 'tpu'
    rs = np.random.RandomState(0)
    R, S = args.rays, args.samples
    P = R * S
    E = 8

    base = FusedLevelSpec(embed_ch=E, compute_dtype='bfloat16')

    def mk_mlp(sizes):
        return [(jnp.asarray(rs.randn(i, o), np.float32) * 0.05,
                 jnp.asarray(rs.randn(o), np.float32) * 0.01)
                for i, o in sizes]

    def field_pairs(fs):
        sizes = []
        for i in range(fs.depth):
            ic = fs.enc_ch if i == 0 else fs.width
            if i > 0 and (i - 1) in fs.skips:
                ic += fs.enc_ch
            sizes.append((ic, fs.width))
        sizes.append((fs.width
                      + (fs.enc_ch if (fs.depth - 1) in fs.skips else 0),
                      fs.out_ch))
        return mk_mlp(sizes)

    def tmpl_pairs(ts):
        sizes = []
        tw = ts.trunk_width
        for i in range(ts.trunk_depth):
            ic = ts.in_ch if i == 0 else tw
            if i > 0 and (i - 1) in ts.skips:
                ic += ts.in_ch
            sizes.append((ic, tw))
        sizes.append((tw + (ts.in_ch if (ts.trunk_depth - 1) in ts.skips
                            else 0), tw))
        sizes.append((tw, tw // 2))
        sizes.append((tw // 2, 1))
        rin = tw // 2 + ts.rgb_cond_ch
        for j in range(ts.rgb_depth):
            ic = rin if j == 0 else ts.rgb_width
            if j > 0 and (j - 1) in ts.skips:
                ic += rin
            sizes.append((ic, ts.rgb_width))
        sizes.append((ts.rgb_width
                      + (rin if (ts.rgb_depth - 1) in ts.skips else 0), 3))
        return mk_mlp(sizes)

    wp = field_pairs(base.warp_fs)
    hp = field_pairs(base.hyper_fs)
    tp = tmpl_pairs(base.tmpl_fs)
    cs = args.cond_samples if args.cond_samples >= 0 else S
    n_cond = R if cs else P
    emb = jnp.asarray(rs.randn(n_cond, E), np.float32)
    cond = jnp.asarray(rs.randn(n_cond, 39), np.float32)
    origins = jnp.asarray(rs.randn(R, 3) * 0.1, np.float32)
    dirs = jnp.asarray(rs.randn(R, 3), np.float32)
    z = jnp.asarray(np.sort(rs.rand(R, S) * 4 + 1, -1), np.float32)
    pts = (origins[:, None, :] + z[..., None] * dirs[:, None, :]
           ).reshape(P, 3)

    def timeit(fn, *a):
        out = fn(*a)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
        return (time.perf_counter() - t0) / args.reps * 1e3

    for tile in map(int, args.tiles.split(',')):
        for bwd in map(int, args.bwd.split(',')):
          for tmpl in map(int, args.tmpl.split(',')):
            for pipe in args.pipe.split(','):
                spec = base._replace(tile=tile, bwd_tile=bwd,
                                     tmpl_bwd_tile=tmpl, cond_samples=cs,
                                     pipelined_bwd=pipe in ('bwd', 'both'),
                                     pipelined_fwd=pipe in ('fwd', 'both'))

                def fwd(pts, emb, cond):
                    if cs:
                        out = fused_level(spec, None, emb, cond, None,
                                          wp, hp, tp, origins=origins,
                                          directions=dirs, z_vals=z)
                    else:
                        out = fused_level(spec, pts, emb, cond, None,
                                          wp, hp, tp)
                    return out['rgb'].sum() + out['alpha'].sum()

                try:
                    f = jax.jit(fwd)
                    fb = jax.jit(jax.value_and_grad(fwd, argnums=(0, 1, 2)))
                    t_f = timeit(f, pts, emb, cond)
                    t_fb = timeit(fb, pts, emb, cond)
                    print(f'tile={tile:5d} bwd={bwd:4d} tmpl={tmpl:4d} '
                          f'cs={cs:3d} pipe={pipe:4s}: fwd {t_f:7.2f} ms   '
                          f'fwd+bwd {t_fb:7.2f} ms   bwd {t_fb - t_f:7.2f} '
                          f'ms', flush=True)
                except Exception as e:
                    print(f'tile={tile} bwd={bwd} tmpl={tmpl} pipe={pipe}: '
                          f'FAIL {type(e).__name__}: {str(e)[:160]}',
                          flush=True)


if __name__ == '__main__':
    main()
