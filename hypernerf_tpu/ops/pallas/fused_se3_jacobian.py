"""Fused SE(3)/quaternion warp-Jacobian: primal (w, v) + forward-mode
tangents d(w, v)/d(points) in one Pallas kernel per tile.

Extends the translation fused Jacobian (fused_jacobian.py) to the screw-
family warps: warped = retract(w(x), v(x), x) with (w, v) from the SE(3)
trunk + heads (fused_se3.py's layer layout). The elastic regularizer
(Nerfies §C; the reference's warp Jacobian raises NotImplementedError,
/root/reference/hypernerf/warping.py:122) needs J = d(warped)/d(points),
which for these warps splits as

  J = d retract/d(w) . dw/dx  +  d retract/d(v) . dv/dx  +  d retract/dx.

The MLP part (dw/dx, dv/dx) is where the FLOPs are, so it rides this
kernel: the three coordinate tangents are STACKED as extra row blocks —
each layer runs ONE (4T, in) @ (in, out) matmul; primal rows get
bias+relu, tangent rows the primal's relu mask; the trunk logit and the
heads are linear, so tangents pass straight through. The retraction part
(closed-form exp-map math on (N, 3) values) is differentiated OUTSIDE in
XLA via ``jax.jvp`` against the kernel's (dw_k, dv_k, e_k) tangents —
see ``fused_se3_warp_jacobian``.

Unlike the translation kernel, the PRIMAL rows carry cotangents too (the
retraction JVP consumes w and v, and the exp map is nonlinear in them),
so the backward runs BOTH pullback streams — the standard primal stream
(fused_se3._backward_tile's math) and the tangent stream
(fused_jacobian's) — as ONE set of stacked transposed matmuls whose row
blocks are gated by [mask | rep3(mask)]: the streams only couple through
the relu masks, whose derivative is zero a.e., so there is no cross
term and dW sums both streams' contributions exactly as autodiff of the
dense path does. db is primal-only; d(embed) flows through the primal
encode pullback (the tangent encode's embed block is a constant zero);
d(points) adds the primal encode pullback and the tangent-encode
pullback (the 4^(min_deg+j) diagonal terms).

The warp_alpha annealing window enters as the usual (1, enc_pad) scale
row: the window is linear in the encoding, so the tangent encode is
scaled by the SAME row (d/dx [s * sin(fx)] = s f cos(fx)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hypernerf_tpu.ops.pallas import fused_field as ff
from hypernerf_tpu.ops.pallas import fused_se3 as fs3
from hypernerf_tpu.ops.pallas.common import vmem_params
from hypernerf_tpu.ops.pallas.fused_field import _dot, _dot_acc, _dot_t
from hypernerf_tpu.ops.pallas.fused_jacobian import (_rep3, _rup,
                                                     _sel_matrix, _tan3)

OUT_PAD = fs3.OUT_PAD   # [w(3) | v(3) | 0 0]


def _tangent_encode(spec: fs3.FusedSE3Spec, t: int, sin_xb, cos_xb,
                    scales=None):
    """(3T, enc_pad) fp32: d encode / d p_k stacked as 3 row blocks.

    Nerfies posenc without identity: segments [sin | cos | embed | pad].
      sin: cos_xb * FM_k;  cos: -sin_xb * FM_k;  embed: 0
    with FM_k the k-th row of the min_deg-aware band matrix
    (2^(min_deg+j) at col j*3+k — the chain factor of sin(2^(m) p_k)).
    """
    s = spec
    fm = ff._band_matrix(3, s.n_freq, s.min_deg)       # (3, nb)
    parts = [_tan3(cos_xb[None] * fm[:, None, :], t),
             _tan3(-sin_xb[None] * fm[:, None, :], t)]
    if s.use_metadata:
        parts.append(jnp.zeros((3 * t, s.embed_ch), jnp.float32))
    pad = s.enc_pad - s.enc_ch
    if pad:
        parts.append(jnp.zeros((3 * t, pad), jnp.float32))
    tan = jnp.concatenate(parts, axis=-1)
    if scales is not None:
        tan = tan * scales.astype(jnp.float32)
    return tan


def _tangent_encode_bwd(spec: fs3.FusedSE3Spec, t: int, sin_xb, cos_xb,
                        g_tan, scales=None):
    """Pullback of _tangent_encode: (3T, enc_pad) cotangent -> (T, 3) dp.

    Only the diagonal (k == c) trig entries depend on p; each carries
    4^(min_deg+j) (one band power from the tangent value, one more from
    differentiating it). The window row scales the cotangent first (the
    tangent encode is linear in the window).
    """
    s = spec
    if scales is not None:
        g_tan = g_tan * scales.astype(jnp.float32)
    nb = 3 * s.n_freq
    fm = ff._band_matrix(3, s.n_freq, s.min_deg)       # 2^(min_deg+j) diag
    sel = _sel_matrix(3, s.n_freq)                     # 1 diag
    g_sin = g_tan[:, :nb].reshape(3, t, nb)
    g_cos = g_tan[:, nb:2 * nb].reshape(3, t, nb)
    # Fold the k blocks onto the diagonal (FM_k zeroes k != c entries).
    a_sin = jnp.sum(g_sin * fm[:, None, :], axis=0)    # (T, nb): g * 2^m
    a_cos = jnp.sum(g_cos * fm[:, None, :], axis=0)
    freq_row = jnp.sum(fm, axis=0)                     # (nb,): 2^m per col
    val = (-sin_xb * a_sin - cos_xb * a_cos) * freq_row[None, :]
    # val carries 4^m-scaled terms: the band -> channel contraction must
    # not round through bf16 (f32 operands, Mosaic accepts HIGHEST).
    return jax.lax.dot_general(val, sel, (((1,), (1,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _jac_fwd_tile(spec: fs3.FusedSE3Spec, x_raw, wbs, scales=None):
    """One tile: (T, RAW_PAD) [pts|embed] -> (w, v) primal rows (T, OUT_PAD
    halves) plus tangent rows (3T, .) fp32, and the backward's stash."""
    s = spec
    dt = jnp.dtype(s.compute_dtype)
    t = x_raw.shape[0]
    enc, trig = fs3._encode(s, x_raw, scales, return_trig=True)
    sin_xb, cos_xb = trig
    tan_enc = _tangent_encode(s, t, sin_xb, cos_xb, scales).astype(dt)
    h, tn = enc, tan_enc
    stash = {'trig': trig, 'enc': enc, 'tan_enc': tan_enc,
             'h_ins': [], 'tn_ins': [], 'masks': []}
    for i in range(s.depth):
        w, b = wbs[i]
        stash['h_ins'].append(h)
        stash['tn_ins'].append(tn)
        pre = _dot(jnp.concatenate([h, tn], axis=0), w)
        hp = pre[:t] + b.astype(jnp.float32)
        mask = (hp > 0).astype(jnp.float32)
        stash['masks'].append(mask)
        h = jnp.maximum(hp, 0.0).astype(dt)
        tn = (pre[t:] * _rep3(mask, t)).astype(dt)
        if i in s.skips:
            h = jnp.concatenate([h, enc], axis=-1)
            tn = jnp.concatenate([tn, tan_enc], axis=-1)
    # Trunk logit: linear, so the tangent passes straight through.
    w, b = wbs[s.depth]
    stash['h_logit_in'], stash['tn_logit_in'] = h, tn
    pre = _dot(jnp.concatenate([h, tn], axis=0), w)
    trunk = (pre[:t] + b.astype(jnp.float32)).astype(dt)
    tn_trunk = pre[t:].astype(dt)
    stash['trunk'], stash['tn_trunk'] = trunk, tn_trunk
    trunk4 = jnp.concatenate([trunk, tn_trunk], axis=0)
    w_w, w_b = wbs[s.depth + 1]
    v_w, v_b = wbs[s.depth + 2]
    w_pre = _dot(trunk4, w_w)
    v_pre = _dot(trunk4, v_w)
    w_prim = w_pre[:t] + w_b.astype(jnp.float32)
    v_prim = v_pre[:t] + v_b.astype(jnp.float32)
    return (w_prim, v_prim, w_pre[t:], v_pre[t:]), stash


def _jac_bwd_tile(spec: fs3.FusedSE3Spec, x_raw, g_all, wbs, scales=None):
    """Backward by recompute: (4T, OUT_PAD) cotangent ([primal rows |
    tangent rows], cols [g_w(3) | g_v(3)]) -> (dx_raw (T, raw_ch),
    [(dW, db)] in layer order). Both streams run as stacked rows."""
    s = spec
    dt = jnp.dtype(s.compute_dtype)
    t = x_raw.shape[0]
    _, stash = _jac_fwd_tile(s, x_raw, wbs, scales)
    sin_xb, cos_xb = stash['trig']
    grads = [None] * s.n_layers
    r4 = 4 * t

    g_w = jnp.concatenate(
        [g_all[:, :3], jnp.zeros((r4, OUT_PAD - 3), jnp.float32)], -1)
    g_v = jnp.concatenate(
        [g_all[:, 3:6], jnp.zeros((r4, OUT_PAD - 3), jnp.float32)], -1)
    g_w_c, g_v_c = g_w.astype(dt), g_v.astype(dt)
    trunk4 = jnp.concatenate([stash['trunk'], stash['tn_trunk']], axis=0)
    # Head dW sums both streams (stacked rows); db is primal rows only.
    grads[s.depth + 1] = (_dot_acc(trunk4, g_w_c),
                          jnp.sum(g_w[:t], axis=0, keepdims=True))
    grads[s.depth + 2] = (_dot_acc(trunk4, g_v_c),
                          jnp.sum(g_v[:t], axis=0, keepdims=True))
    g4 = (_dot_t(g_w_c, wbs[s.depth + 1][0])
          + _dot_t(g_v_c, wbs[s.depth + 2][0])).astype(dt)

    logit_in4 = jnp.concatenate(
        [stash['h_logit_in'], stash['tn_logit_in']], axis=0)
    grads[s.depth] = (_dot_acc(logit_in4, g4),
                      jnp.sum(g4[:t].astype(jnp.float32), axis=0,
                              keepdims=True))
    g4 = _dot_t(g4, wbs[s.depth][0]).astype(dt)

    g_enc4 = jnp.zeros((r4, s.enc_pad), jnp.float32)
    if (s.depth - 1) in s.skips:
        g_enc4 += g4[:, s.w_pad:].astype(jnp.float32)
        g4 = g4[:, :s.w_pad]
    for i in range(s.depth - 1, -1, -1):
        mask4 = jnp.concatenate(
            [stash['masks'][i], _rep3(stash['masks'][i], t)], axis=0)
        gp = (g4.astype(jnp.float32) * mask4).astype(dt)
        ins4 = jnp.concatenate(
            [stash['h_ins'][i], stash['tn_ins'][i]], axis=0)
        grads[i] = (_dot_acc(ins4, gp),
                    jnp.sum(gp[:t].astype(jnp.float32), axis=0,
                            keepdims=True))
        g4 = _dot_t(gp, wbs[i][0]).astype(dt)
        if i > 0 and (i - 1) in s.skips:
            g_enc4 += g4[:, s.w_pad:].astype(jnp.float32)
            g4 = g4[:, :s.w_pad]
    g_enc4 += g4.astype(jnp.float32)

    # Primal stream: encode pullback -> (T, raw_ch) [d pts | d embed];
    # tangent stream: the 4^m diagonal terms -> (T, 3) d pts.
    dx_prim = fs3._encode_bwd(s, x_raw, g_enc4[:t], scales,
                              trig=stash['trig'])
    dp_tan = _tangent_encode_bwd(s, t, sin_xb, cos_xb, g_enc4[t:], scales)
    dx_raw = jnp.concatenate([dx_prim[:, :3] + dp_tan, dx_prim[:, 3:]], -1)
    return dx_raw, grads


def _make_fwd_kernel(spec: fs3.FusedSE3Spec):
    s = spec

    def kernel(*refs):
        x_ref = refs[0]
        off = 1
        scales = refs[off][:] if s.windowed else None
        off += 1 if s.windowed else 0
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(s.n_layers)]
        out_ref = refs[off + 2 * s.n_layers]
        (w_p, v_p, w_t, v_t), _ = _jac_fwd_tile(s, x_ref[:], wbs, scales)
        t = w_p.shape[0]
        prim = jnp.concatenate(
            [w_p[:, :3], v_p[:, :3],
             jnp.zeros((t, OUT_PAD - 6), jnp.float32)], axis=-1)
        tang = jnp.concatenate(
            [w_t[:, :3], v_t[:, :3],
             jnp.zeros((3 * t, OUT_PAD - 6), jnp.float32)], axis=-1)
        out_ref[:] = jnp.concatenate([prim, tang], axis=0)
    return kernel


def _make_bwd_kernel(spec: fs3.FusedSE3Spec):
    s = spec

    def kernel(*refs):
        x_ref = refs[0]
        off = 1
        scales = refs[off][:] if s.windowed else None
        off += 1 if s.windowed else 0
        g_ref = refs[off]
        off += 1
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(s.n_layers)]
        o = off + 2 * s.n_layers
        dx_ref = refs[o]
        dwb_refs = refs[o + 1:o + 1 + 2 * s.n_layers]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in dwb_refs:
                r[:] = jnp.zeros(r.shape, r.dtype)

        x_raw = x_ref[:]
        dx_raw, grads = _jac_bwd_tile(s, x_raw, g_ref[:], wbs, scales)
        pad = x_raw.shape[1] - dx_raw.shape[1]
        if pad:
            dx_raw = jnp.concatenate(
                [dx_raw, jnp.zeros((x_raw.shape[0], pad), jnp.float32)], -1)
        dx_ref[:] = dx_raw
        for k, (dw, db) in enumerate(grads):
            dwb_refs[2 * k][:] += dw
            dwb_refs[2 * k + 1][:] += db
    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(spec: fs3.FusedSE3Spec, x_raw, scales, padded_flat):
    return _fused_fwd(spec, x_raw, scales, padded_flat)[0]


def _fused_fwd(spec, x_raw, scales, padded_flat):
    s = spec
    p = x_raw.shape[0]
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    sc_in, sc_specs = fs3._scales_specs(s, scales)
    w_in, w_specs = fs3._weight_specs(padded_wbs)
    data_spec = pl.BlockSpec((s.tile, x_raw.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_fwd_kernel(s),
        grid=(p // s.tile,),
        in_specs=[data_spec] + sc_specs + w_specs,
        out_specs=pl.BlockSpec((4 * s.tile, OUT_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * p, OUT_PAD), jnp.float32),
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(x_raw, *sc_in, *w_in)
    return out, (x_raw, scales, padded_flat)


def _fused_bwd(spec, res, g):
    x_raw, scales, padded_flat = res
    s = spec._replace(tile=spec.bwd_tile or spec.tile)
    p = x_raw.shape[0]
    if s.tile != spec.tile:
        # The forward output — and therefore its cotangent — is per-FWD-
        # tile contiguous: [tile_i: prim(tf) | tan0(tf) | tan1(tf) |
        # tan2(tf)]. The backward blocks rows in 4*bwd_tile groups and
        # reads each as [prim(tb) | tan(3tb)], so regroup via stream-major
        # (4, P, C) — two cheap XLA transposes on (4P, 8) f32. p is
        # lcm(tile, bwd_tile)-aligned (fused_se3_wv_tangents).
        g = (g.reshape(p // spec.tile, 4, spec.tile, OUT_PAD)
              .transpose(1, 0, 2, 3)
              .reshape(4, p // s.tile, s.tile, OUT_PAD)
              .transpose(1, 0, 2, 3).reshape(4 * p, OUT_PAD))
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    sc_in, sc_specs = fs3._scales_specs(s, scales)
    w_in, w_specs = fs3._weight_specs(padded_wbs)
    data_spec = pl.BlockSpec((s.tile, x_raw.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((4 * s.tile, OUT_PAD), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct(x_raw.shape, jnp.float32)]
    out_specs = [data_spec]
    for w, b in padded_wbs:
        out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                       jax.ShapeDtypeStruct(b.shape, jnp.float32)]
        out_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        _make_bwd_kernel(s),
        grid=(p // s.tile,),
        in_specs=[data_spec] + sc_specs + [g_spec] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(x_raw, *sc_in, g, *w_in)
    dx = outs[0].astype(x_raw.dtype)
    dflat = tuple(outs[1 + k].astype(padded_flat[k].dtype)
                  for k in range(len(padded_flat)))
    d_scales = None if scales is None else jnp.zeros_like(scales)
    return dx, d_scales, dflat


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_se3_wv_tangents(spec: fs3.FusedSE3Spec, points, embed, pairs,
                          enc_scales=None):
    """(points, embed) -> (w, v, dw, dv): the trunk outputs and their
    point-tangents, fused on-TPU.

    points (..., 3), embed (..., E) -> w, v (..., 3) fp32 and dw, dv
    (..., 3, 3) with [..., i, k] = d {w,v}_i / d points_k. Differentiable
    w.r.t. points, embed, and the MLP params — exact-parity with autodiff
    of the dense trunk (the streams couple only through relu masks, zero
    derivative a.e.).
    """
    s = spec
    assert (enc_scales is not None) == s.windowed
    batch = points.shape[:-1]
    pts = points.reshape(-1, 3).astype(jnp.float32)
    n = pts.shape[0]
    parts = [pts]
    if s.use_metadata:
        parts.append(embed.reshape(-1, embed.shape[-1]).astype(jnp.float32))
    parts.append(jnp.zeros((n, fs3.RAW_PAD - s.raw_ch), jnp.float32))
    raw = jnp.concatenate(parts, axis=-1)
    import math as _math
    granularity = _math.lcm(s.tile, s.bwd_tile or s.tile)
    p = _rup(max(n, granularity), granularity)
    x_pad = jnp.pad(raw, ((0, p - n), (0, 0)))
    padded = fs3._pad_params(s, pairs)
    flat = tuple(a for wb in padded for a in wb)
    out = _fused(s, x_pad, enc_scales, flat)           # (4P, OUT_PAD)
    # Kernel output is PER-TILE contiguous: [tile0: prim, k=0,1,2 | ...].
    # Regroup (XLA-side, cheap; its transpose routes the backward
    # cotangent to the right tiles) before slicing the valid rows.
    blocks = out.reshape(p // s.tile, 4, s.tile, OUT_PAD)
    prim = blocks[:, 0].reshape(p, OUT_PAD)[:n]
    tang = (blocks[:, 1:].transpose(1, 0, 2, 3)
            .reshape(3, p, OUT_PAD)[:, :n, :])          # (3(k), N, 6)
    w, v = prim[:, :3], prim[:, 3:6]
    dw = jnp.moveaxis(tang[..., :3], 0, -1)             # (N, 3(i), 3(k))
    dv = jnp.moveaxis(tang[..., 3:6], 0, -1)
    return (w.reshape(*batch, 3), v.reshape(*batch, 3),
            dw.reshape(*batch, 3, 3), dv.reshape(*batch, 3, 3))


def fused_se3_warp_jacobian(spec: fs3.FusedSE3Spec, points, embed, pairs,
                            retract_fn, enc_scales=None):
    """J = d(warped)/d(points) of an SE(3)-family warp, fused on-TPU.

    pts (..., 3), embed (..., E) -> (..., 3, 3) with [..., i, k] =
    d warped_i / d points_k (jacrev layout — matches models/warping.py
    ``_warp_jacobian`` over the dense path). ``retract_fn(w, v, pts,
    axis=)`` is the warp's closed-form VECTOR-FORM retraction
    (SE3Field/QuaternionField ``_retract``), called here with ``axis=0``
    on component-major (3, N) operands; its point-Jacobian columns come
    from one vmapped ``jax.jvp`` against the kernel's (dw_k, dv_k, e_k)
    tangents — full-lane row math, differentiable end to end.
    """
    batch = points.shape[:-1]
    pts = points.reshape(-1, 3).astype(jnp.float32)
    emb = embed.reshape(-1, embed.shape[-1])
    w, v, dw, dv = fused_se3_wv_tangents(spec, pts, emb, pairs,
                                         enc_scales=enc_scales)
    # COMPONENT-MAJOR retraction JVP: every operand goes in as (3, N) rows
    # (tangent stacks (3(k), 3, N)) and retract_fn runs with axis=0, so
    # the exp-map math — and its vmapped linearization AND the loss's
    # reverse pass through it — is full-lane (1, N)/(3, N) elementwise.
    # The row-major path ((N, 3) operands through the (N, 4, 4) matrix
    # retraction) lowered to ~110 ms/step of 3-lane batched-matmul
    # fusions and layout copies at the bench config; these five (N, 3)
    # transposes cost ~1 ms each (BENCHMARKS round 5).
    wc, vc, pc = w.T, v.T, pts.T                        # (3(i), N)
    twc = jnp.transpose(dw, (2, 1, 0))                  # (3(k), 3(i), N)
    tvc = jnp.transpose(dv, (2, 1, 0))
    eye = jnp.broadcast_to(
        jnp.eye(3, dtype=pts.dtype)[:, :, None],
        (3, 3, pts.shape[0]))                           # eye[k, i] = d_ki
    # One vmapped JVP over the 3 coordinate tangents (a leading batch dim
    # on the SAME linearization point).
    cols = jax.vmap(
        lambda twk, tvk, tpk: jax.jvp(
            lambda a, b, p: retract_fn(a, b, p, axis=0),
            (wc, vc, pc), (twk, tvk, tpk))[1]
    )(twc, tvc, eye)                                    # (3(k), 3(i), N)
    jac = jnp.transpose(cols, (2, 1, 0))                # (N, 3(i), 3(k))
    return jac.reshape(*batch, 3, 3)
