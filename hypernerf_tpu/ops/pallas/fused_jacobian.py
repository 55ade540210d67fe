"""Fused warp-Jacobian kernel: forward-mode tangents through the
translation warp MLP in one Pallas kernel per tile.

The elastic regularizer (Nerfies §C; the reference's warp Jacobian raises
NotImplementedError, /root/reference/hypernerf/warping.py:122) needs
J = d(warped)/d(points) at K importance-sampled points per ray. The dense
side channel (models/warping.py ``_warp_jacobian``: one jax.vjp
linearization pulled back with the 3 coordinate cotangents) re-runs the
warp MLP through XLA at (T, 3)-shaped tensors — 3/128 lane utilization on
the posenc/trig glue — and held elastic mode at 0.80x the flagship
(BENCHMARKS.md round 4).

This kernel instead STACKS the three coordinate tangents as extra row
blocks: each layer runs ONE (4T, in) @ (in, out) matmul — primal rows get
bias+relu, tangent rows get the primal's relu mask — so the whole
Jacobian rides the MXU at the same utilization as the warp forward.
Identical math to forward-mode autodiff through the dense path:

  tangent-encode: d posenc_orig(p)/dp_k = [e_k | cos_xb * B_k | -sin_xb * B_k]
                  (B_k = the band matrix row of channel k), embed part 0
  hidden layer:   t <- (t @ W) * 1[h_pre > 0]   (relu JVP)
  output layer:   t_out <- t @ W;  J[., i, k] = delta_ik + t_out[k-block, i]

The backward is hand-derived and EXACT for the same reason autodiff's is:
the relu mask's derivative is zero a.e., and the primal output carries no
cotangent (only J is consumed), so the cotangent flows purely through the
tangent stream — transposed matmuls gated by the same masks, plus the
tangent-encode pullback to d(points) (the 4^j diagonal terms). d(embed)
and d(bias) are exactly zero, matching jax.grad of the dense path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hypernerf_tpu.ops.pallas import fused_field as ff
from hypernerf_tpu.ops.pallas.common import drive, vmem_params

LANE = 128


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _freq_matrix(ch: int, n_freq: int):
    """(ch, n_freq*ch) with [c, j*ch+c] = 2^j — the band matrix (iota-built;
    kernels cannot capture array constants)."""
    return ff._band_matrix(ch, n_freq)


def _sel_matrix(ch: int, n_freq: int):
    """(ch, n_freq*ch) channel-selection matrix: [c, j*ch+c] = 1."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (ch, n_freq * ch), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ch, n_freq * ch), 1)
    return jnp.where(cols % ch == rows, 1.0, 0.0)


def _rep3(a, t: int):
    """(T, C) -> (3T, C): three stacked copies (broadcast along a new
    leading dim + sublane-collapsing reshape — lanes unchanged, cheap)."""
    c = a.shape[-1]
    return jnp.broadcast_to(a[None], (3, t, c)).reshape(3 * t, c)


def _tan3(per_k, t: int):
    """(3, T, C) -> (3T, C) row blocks [k*T + t]."""
    return per_k.reshape(3 * t, per_k.shape[-1])


def _tangent_encode(spec: ff.FusedFieldSpec, t: int, sin_xb, cos_xb):
    """(3T, enc_pad) fp32: d encode / d p_k stacked as 3 row blocks.

    Segment layout must be the translation warp's ((3, F), (E, 0)):
    [p | sin | cos | embed | pad]. Tangent blocks:
      identity: e_k;  sin: cos_xb * FM_k;  cos: -sin_xb * FM_k;  embed: 0
    with FM_k the k-th row of the band matrix (2^j at col j*3+k).
    """
    (ch, n_freq, _, ident), (emb_ch, emb_f, _, _) = (
        ff.norm_seg(spec.segments[0]), ff.norm_seg(spec.segments[1]))
    assert ch == 3 and ident and emb_f == 0, spec.segments
    fm = _freq_matrix(ch, n_freq)                      # (3, nb)
    parts = []
    # identity tangent: (3, T, 3) with [k, t, c] = delta_kc
    k_i = jax.lax.broadcasted_iota(jnp.int32, (3, t, ch), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (3, t, ch), 2)
    parts.append(_tan3(jnp.where(k_i == c_i, 1.0, 0.0), t))
    # sin tangent: cos_xb broadcast over k, scaled by FM_k
    parts.append(_tan3(cos_xb[None] * fm[:, None, :], t))
    parts.append(_tan3(-sin_xb[None] * fm[:, None, :], t))
    parts.append(jnp.zeros((3 * t, emb_ch), jnp.float32))
    pad = spec.enc_pad - spec.enc_ch
    if pad:
        parts.append(jnp.zeros((3 * t, pad), jnp.float32))
    return jnp.concatenate(parts, axis=-1)


def _tangent_encode_bwd(spec: ff.FusedFieldSpec, t: int, sin_xb, cos_xb,
                        g_tan):
    """Pullback of _tangent_encode: (3T, enc_pad) cotangent -> (T, 3) dp.

    Only the diagonal (k == c) trig entries depend on p:
      d/dp_c [cos(2^j p_c) 2^j] = -sin(2^j p_c) 4^j
      d/dp_c [-sin(2^j p_c) 2^j] = -cos(2^j p_c) 4^j
    """
    (ch, n_freq, _, _), _ = (ff.norm_seg(spec.segments[0]),
                             ff.norm_seg(spec.segments[1]))
    nb = n_freq * ch
    fm = _freq_matrix(ch, n_freq)                      # (3, nb): 2^j diag
    sel = _sel_matrix(ch, n_freq)                      # (3, nb): 1 diag
    g_sin = g_tan[:, ch:ch + nb].reshape(3, t, nb)
    g_cos = g_tan[:, ch + nb:ch + 2 * nb].reshape(3, t, nb)
    # Fold the k blocks onto the diagonal (FM_k zeroes k != c entries).
    a_sin = jnp.sum(g_sin * fm[:, None, :], axis=0)    # (T, nb): g * 2^j
    a_cos = jnp.sum(g_cos * fm[:, None, :], axis=0)
    # Remaining factor: -trig * 2^j (one more band power), contract j -> c.
    freq_row = jnp.sum(fm, axis=0)                     # (nb,): 2^j per col
    val = (-sin_xb * a_sin - cos_xb * a_cos) * freq_row[None, :]
    # Selection matmul: val carries 4^j-scaled terms, so the band -> channel
    # contraction must not round through bf16 (f32 operands, so Mosaic
    # accepts HIGHEST — the repo convention for iota-built selections).
    return jax.lax.dot_general(val, sel, (((1,), (1,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _jac_fwd_tile(spec: ff.FusedFieldSpec, x_raw, wbs):
    """One tile: (T, 3+E) [pts|embed] -> tangent output rows (3T, OUT_PAD)
    fp32 (J columns; add delta_ik outside). Also returns the recompute
    stash for the backward."""
    s = spec
    dt = jnp.dtype(s.compute_dtype)
    t = x_raw.shape[0]
    enc, trig = drive(ff._encode_gen(s, x_raw, None, None, True))
    sin_xb, cos_xb = trig[0]
    tan_enc = _tangent_encode(s, t, sin_xb, cos_xb).astype(dt)
    h, tn = enc, tan_enc
    # Stash only what the backward reads (trig/tn_ins/masks/tn_last):
    # stashing the primal layer inputs too would extend their VMEM liveness
    # across the whole recompute for nothing.
    stash = {'trig': (sin_xb, cos_xb), 'tn_ins': [], 'masks': []}
    for i in range(s.depth):
        w, b = wbs[i]
        stash['tn_ins'].append(tn)
        both = jnp.concatenate([h, tn], axis=0)
        pre = jax.lax.dot_general(both, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        hp = pre[:t] + b.astype(jnp.float32)
        mask = (hp > 0).astype(jnp.float32)
        stash['masks'].append(mask)
        h = jnp.maximum(hp, 0.0).astype(dt)
        tn = (pre[t:] * _rep3(mask, t)).astype(dt)
        if i in s.skips:
            h = jnp.concatenate([h, enc], axis=-1)
            tn = jnp.concatenate([tn, tan_enc], axis=-1)
    w, b = wbs[s.depth]
    stash['tn_last'] = tn
    t_out = jax.lax.dot_general(tn, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return t_out, stash


def _jac_bwd_tile(spec: ff.FusedFieldSpec, x_raw, g_tout, wbs):
    """Backward of _jac_fwd_tile by recompute: cotangent on the tangent
    output rows -> (dp (T, 3), [(dW, db=0)] in layer order).

    No primal cotangent exists (only J is consumed) and the relu mask's
    derivative is zero a.e., so the pullback runs purely down the tangent
    stream: g gated by the forward masks, transposed matmuls, dW from
    (tangent input)^T @ (gated g), and the tangent-encode pullback for dp.
    """
    s = spec
    t = x_raw.shape[0]
    _, stash = _jac_fwd_tile(s, x_raw, wbs)
    sin_xb, cos_xb = stash['trig']
    grads = [None] * (s.depth + 1)

    # Output layer: dW = tn_last^T @ g; db = 0 (bias is primal-only).
    w, b = wbs[s.depth]
    grads[s.depth] = (
        jax.lax.dot_general(stash['tn_last'], g_tout,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32),
        jnp.zeros_like(b, jnp.float32))
    g = jax.lax.dot_general(g_tout, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g_tan_enc = jnp.zeros((3 * t, s.enc_pad), jnp.float32)
    for i in range(s.depth - 1, -1, -1):
        if i in s.skips:
            g_tan_enc = g_tan_enc + g[:, s.w_pad:s.w_pad + s.enc_pad]
            g = g[:, :s.w_pad]
        w, b = wbs[i]
        gp = g * _rep3(stash['masks'][i], t)
        grads[i] = (
            jax.lax.dot_general(stash['tn_ins'][i], gp,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32),
            jnp.zeros_like(b, jnp.float32))
        g = jax.lax.dot_general(gp, w, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    g_tan_enc = g_tan_enc + g
    dp = _tangent_encode_bwd(s, t, sin_xb, cos_xb, g_tan_enc)
    return dp, grads


def _make_fwd_kernel(spec: ff.FusedFieldSpec, n_layers: int):
    def kernel(*refs):
        x_ref = refs[0]
        wbs = [(refs[1 + 2 * k][:], refs[2 + 2 * k][:])
               for k in range(n_layers)]
        out_ref = refs[1 + 2 * n_layers]
        t_out, _ = _jac_fwd_tile(spec, x_ref[:], wbs)
        out_ref[:] = t_out
    return kernel


def _make_bwd_kernel(spec: ff.FusedFieldSpec, n_layers: int):
    def kernel(*refs):
        x_ref = refs[0]
        g_ref = refs[1]
        wbs = [(refs[2 + 2 * k][:], refs[3 + 2 * k][:])
               for k in range(n_layers)]
        dx_ref = refs[2 + 2 * n_layers]
        dwb_refs = refs[3 + 2 * n_layers:3 + 4 * n_layers]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in dwb_refs:
                r[:] = jnp.zeros(r.shape, r.dtype)

        dp, grads = _jac_bwd_tile(spec, x_ref[:], g_ref[:], wbs)
        t = x_ref.shape[0]
        dx_ref[:] = jnp.concatenate(
            [dp, jnp.zeros((t, x_ref.shape[1] - 3), jnp.float32)], axis=-1)
        for k, (dw, db) in enumerate(grads):
            dwb_refs[2 * k][:] += dw
            dwb_refs[2 * k + 1][:] += db
    return kernel


def _tile_specs(spec, widths, rows_mult=1):
    return [pl.BlockSpec((rows_mult * spec.tile, w),
                         lambda i: (i, 0), memory_space=pltpu.VMEM)
            for w in widths]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(spec: ff.FusedFieldSpec, x_pad, padded_flat):
    return _fused_fwd(spec, x_pad, padded_flat)[0]


def _fused_fwd(spec, x_pad, padded_flat):
    s = spec
    p = x_pad.shape[0]
    n_tiles = p // s.tile
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    w_in, w_specs = [], []
    for w, b in padded_wbs:
        w_in += [w, b]
        w_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)]
    t_out = pl.pallas_call(
        _make_fwd_kernel(s, len(padded_wbs)),
        grid=(n_tiles,),
        in_specs=_tile_specs(s, [x_pad.shape[1]]) + w_specs,
        out_specs=_tile_specs(s, [ff.OUT_PAD], rows_mult=3),
        out_shape=[jax.ShapeDtypeStruct((3 * p, ff.OUT_PAD), jnp.float32)],
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(x_pad, *w_in)[0]
    return t_out, (x_pad, padded_flat)


def _fused_bwd(spec, res, g):
    s = spec
    x_pad, padded_flat = res
    p = x_pad.shape[0]
    n_tiles = p // s.tile
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    w_in, w_specs = [], []
    for w, b in padded_wbs:
        w_in += [w, b]
        w_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((p, x_pad.shape[1]), jnp.float32)]
    out_specs = _tile_specs(s, [x_pad.shape[1]])
    for w, b in padded_wbs:
        out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                       jax.ShapeDtypeStruct(b.shape, jnp.float32)]
        out_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)]
    outs = pl.pallas_call(
        _make_bwd_kernel(s, len(padded_wbs)),
        grid=(n_tiles,),
        in_specs=(_tile_specs(s, [x_pad.shape[1]])
                  + _tile_specs(s, [ff.OUT_PAD], rows_mult=3) + w_specs),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(x_pad, g, *w_in)
    dx = outs[0].astype(x_pad.dtype)
    dflat = tuple(outs[1 + k].astype(padded_flat[k].dtype)
                  for k in range(len(padded_flat)))
    return dx, dflat


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_warp_jacobian(spec: ff.FusedFieldSpec, pts, embed, pairs):
    """J = d(warped)/d(points) of the translation warp, fused on-TPU.

    pts (..., 3), embed (..., E) -> (..., 3, 3) with [..., i, k] =
    d warped_i / d points_k (jacrev layout — matches models/warping.py
    ``_warp_jacobian`` over the dense path). Differentiable w.r.t. pts and
    the MLP params; d(embed) and d(bias) are exact zeros (relu masks carry
    no gradient a.e., identical to autodiff of the dense path).
    """
    s = spec
    batch = pts.shape[:-1]
    raw = jnp.concatenate(
        [pts.reshape(-1, 3).astype(jnp.float32),
         embed.reshape(-1, embed.shape[-1]).astype(jnp.float32)], axis=-1)
    n = raw.shape[0]
    p = _rup(max(n, s.tile), s.tile)
    x_pad = jnp.pad(raw, ((0, p - n), (0, 0)))
    padded = ff._pad_params(s, pairs)
    flat = tuple(a for wb in padded for a in wb)
    t_out = _fused(s, x_pad, flat)                    # (3P, OUT_PAD)
    # Kernel output is PER-TILE contiguous: [tile0: k=0,1,2 | tile1: ...].
    # Regroup to k-major before slicing the valid rows (XLA-side, cheap;
    # its transpose routes the backward cotangent to the right tiles).
    cols = (t_out.reshape(p // s.tile, 3, s.tile, ff.OUT_PAD)
            .transpose(1, 0, 2, 3)
            .reshape(3, p, ff.OUT_PAD)[:, :n, :3])     # (3(k), N, 3(i))
    jac = jnp.moveaxis(cols, 0, -1)                    # (N, 3(i), 3(k))
    eye = jnp.eye(3, dtype=jac.dtype)
    return (jac + eye).reshape(*batch, 3, 3)
