"""Fused SE(3) warp-field trunk: in-kernel Nerfies posenc + trunk + w/v heads.

The SE3Field (models/warping.py) is: posenc(points, deg 0..8, no identity)
[++ embed] -> trunk MLP (6x128, skip at 4, linear 128->128 output) ->
w_net/v_net heads (Linear 128->3 each) -> screw-axis exponential ->
rigid transform of the points. This kernel fuses everything up to (w, v);
the exponential map and point transform stay in XLA (tiny (P, 3)-shaped math
with awkward 3x3 layouts that Mosaic handles poorly — ops/rigid_body.py is
already batched and tested).

Encoding note: Nerfies posenc without identity over degrees [0, D) equals the
posenc_orig sin/cos blocks with D log-scale bands, so the band-matrix MXU
expansion from fused_field is reused (minus the identity block).

Backward: per-tile recompute with fp32 dW/db accumulated across the grid,
analytic posenc VJP for d(points), pass-through for d(embed).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hypernerf_tpu.ops.pallas.common import vmem_params

from hypernerf_tpu.ops.pallas.fused_field import (LANE, _band_matrix, _dot,
                                                  _dot_acc, _dot_t, _rup)

OUT_PAD = 8   # [w(3) | v(3) | 0 0]
RAW_PAD = 16  # [points(3) | embed(E)] padded lanes


class FusedSE3Spec(NamedTuple):
    embed_ch: int = 8
    use_metadata: bool = True
    min_deg: int = 0
    max_deg: int = 8
    depth: int = 6
    width: int = 128
    skips: Tuple[int, ...] = (4,)
    tile: int = 1024
    bwd_tile: int = 0
    interpret: bool = False
    compute_dtype: str = 'bfloat16'
    # Take a (1, enc_pad) per-feature window row (the warp_alpha annealing;
    # build with fused_field.encoding_scales over ``enc_segments``).
    windowed: bool = False
    # Hidden-layer epilogues (bias+relu) in the compute dtype instead of
    # fp32 (see fused_mlp.FusedMLPSpec.bf16_epilogue).
    bf16_epilogue: bool = False

    @property
    def n_freq(self) -> int:
        return self.max_deg - self.min_deg

    @property
    def raw_ch(self) -> int:
        return 3 + (self.embed_ch if self.use_metadata else 0)

    @property
    def enc_ch(self) -> int:
        return 3 * 2 * self.n_freq + (self.embed_ch if self.use_metadata
                                      else 0)

    @property
    def enc_pad(self) -> int:
        return _rup(self.enc_ch, LANE)

    @property
    def w_pad(self) -> int:
        return _rup(self.width, LANE)

    @property
    def n_layers(self) -> int:
        # hidden 0..depth-1, trunk logit (no act), w head, v head
        return self.depth + 3

    @property
    def enc_segments(self) -> tuple:
        segs = ((3, self.n_freq, self.min_deg, False),)
        if self.use_metadata:
            segs += ((self.embed_ch, 0),)
        return segs


def _encode_gen(spec: FusedSE3Spec, x_raw, scales=None, return_trig=False):
    """Generator form of _encode (yields inside the band trig)."""
    s = spec
    dt = jnp.dtype(s.compute_dtype)
    pts = x_raw[:, :3].astype(jnp.float32)
    if s.min_deg:
        pts = pts * (2.0 ** s.min_deg)
    from hypernerf_tpu.ops.pallas.fused_field import _band_trig_gen
    sin_xb, cos_xb = yield from _band_trig_gen(pts, 3, s.n_freq)
    parts = [sin_xb.astype(dt), cos_xb.astype(dt)]
    if s.use_metadata:
        parts.append(x_raw[:, 3:3 + s.embed_ch].astype(dt))
    pad = s.enc_pad - s.enc_ch
    if pad:
        parts.append(jnp.zeros((x_raw.shape[0], pad), dt))
    enc = jnp.concatenate(parts, axis=-1)
    if scales is not None:
        enc = (enc.astype(jnp.float32)
               * scales.astype(jnp.float32)).astype(dt)
    if return_trig:
        return enc, (sin_xb, cos_xb)
    return enc


def _encode(spec: FusedSE3Spec, x_raw, scales=None, return_trig=False):
    """Nerfies posenc (no identity) over the point segment [+ raw embed].

    ``scales``: optional (1, enc_pad) fp32 window row (warp_alpha annealing).
    ``return_trig`` additionally returns the fp32 (sin_xb, cos_xb) pair so
    the backward can reuse it (bit-identical, half the transcendentals).
    """
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_encode_gen(spec, x_raw, scales, return_trig))


def _encode_bwd_gen(spec: FusedSE3Spec, x_raw, g_enc, scales=None,
                    trig=None):
    """Generator form of _encode_bwd."""
    s = spec
    if scales is not None:
        g_enc = g_enc.astype(jnp.float32) * scales.astype(jnp.float32)
    fc = 3 * s.n_freq
    scale = 2.0 ** s.min_deg if s.min_deg else 1.0
    band = _band_matrix(3, s.n_freq)
    if trig is not None:
        sin_xb, cos_xb = trig
    else:
        from hypernerf_tpu.ops.pallas.fused_field import _band_trig_gen
        pts = x_raw[:, :3].astype(jnp.float32)
        sin_xb, cos_xb = yield from _band_trig_gen(pts * scale, 3, s.n_freq)
    g_sin = g_enc[:, :fc].astype(jnp.float32)
    g_cos = g_enc[:, fc:2 * fc].astype(jnp.float32)
    flat = cos_xb * g_sin - sin_xb * g_cos
    yield
    d_pts = jax.lax.dot_general(flat, band, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
    parts = [d_pts]
    if s.use_metadata:
        parts.append(g_enc[:, 2 * fc:2 * fc + s.embed_ch]
                     .astype(jnp.float32))
    return jnp.concatenate(parts, axis=-1)


def _encode_bwd(spec: FusedSE3Spec, x_raw, g_enc, scales=None, trig=None):
    """VJP of _encode: -> (T, raw_ch) fp32.

    ``trig``: optional fp32 (sin_xb, cos_xb) from the forward recompute —
    skips the band matmul and sin/cos with bit-identical results.
    """
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_encode_bwd_gen(spec, x_raw, g_enc, scales, trig))


def _layer_row_segs(spec: FusedSE3Spec):
    s = spec
    enc_seg = [(s.enc_ch, s.enc_pad)]
    defs = []
    for i in range(s.depth):
        segs = list(enc_seg) if i == 0 else [(s.width, s.w_pad)]
        if i > 0 and (i - 1) in s.skips:
            segs.extend(enc_seg)
        defs.append((segs, s.width, s.w_pad))
    segs = [(s.width, s.w_pad)]
    if (s.depth - 1) in s.skips:
        segs.extend(enc_seg)
    defs.append((segs, s.width, s.w_pad))          # trunk logit
    defs.append(([(s.width, s.w_pad)], 3, OUT_PAD))  # w head
    defs.append(([(s.width, s.w_pad)], 3, OUT_PAD))  # v head
    return defs


def _pad_params(spec: FusedSE3Spec, pairs):
    dt = jnp.dtype(spec.compute_dtype)
    defs = _layer_row_segs(spec)
    assert len(defs) == len(pairs), (len(defs), len(pairs))
    padded = []
    for (segs, out_orig, out_pad), (w, b) in zip(defs, pairs):
        rows, start = [], 0
        for orig, pad in segs:
            rows.append(jnp.pad(w[start:start + orig],
                                ((0, pad - orig), (0, 0))))
            start += orig
        wp = jnp.concatenate(rows, 0) if len(rows) > 1 else rows[0]
        wp = jnp.pad(wp, ((0, 0), (0, out_pad - out_orig))).astype(dt)
        bp = jnp.pad(b, (0, out_pad - out_orig)).astype(dt)[None, :]
        padded.append((wp, bp))
    return padded


def _forward_tile_gen(spec: FusedSE3Spec, x_raw, wbs, scales=None):
    """Generator form of _forward_tile (yields at op-group boundaries)."""
    s = spec
    dt = jnp.dtype(s.compute_dtype)
    enc, trig = yield from _encode_gen(s, x_raw, scales, return_trig=True)
    yield
    ins, outs = [], []
    h = enc
    for i in range(s.depth):
        w, b = wbs[i]
        ins.append(h)
        from hypernerf_tpu.ops.pallas.fused_mlp import _dot_act
        h = _dot_act(h, w, b, dt, epi_in_dt=s.bf16_epilogue)
        yield
        outs.append(h)
        if i in s.skips:
            h = jnp.concatenate([h, enc], axis=-1)
    w, b = wbs[s.depth]
    logit_in = h
    from hypernerf_tpu.ops.pallas.fused_mlp import _dot_act
    trunk = _dot_act(h, w, b, dt, relu=False, epi_in_dt=s.bf16_epilogue)
    yield
    w_w, w_b = wbs[s.depth + 1]
    v_w, v_b = wbs[s.depth + 2]
    w_out = _dot(trunk, w_w) + w_b.astype(jnp.float32)
    v_out = _dot(trunk, v_w) + v_b.astype(jnp.float32)
    return enc, trig, ins, outs, logit_in, trunk, w_out, v_out


def _forward_tile(spec: FusedSE3Spec, x_raw, wbs, scales=None):
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_forward_tile_gen(spec, x_raw, wbs, scales))


def _backward_tile_gen(spec: FusedSE3Spec, x_raw, g_wv, wbs, scales=None,
                       fwd_vals=None):
    """Generator form of _backward_tile (yields at op-group boundaries)."""
    s = spec
    dt = jnp.dtype(s.compute_dtype)
    if fwd_vals is None:
        fwd_vals = yield from _forward_tile_gen(s, x_raw, wbs, scales)
    enc, trig, ins, outs, logit_in, trunk, _, _ = fwd_vals
    t = x_raw.shape[0]
    grads = [None] * s.n_layers

    g_w = jnp.concatenate([g_wv[:, :3],
                           jnp.zeros((t, OUT_PAD - 3), jnp.float32)], -1)
    g_v = jnp.concatenate([g_wv[:, 3:6],
                           jnp.zeros((t, OUT_PAD - 3), jnp.float32)], -1)
    g_w_c, g_v_c = g_w.astype(dt), g_v.astype(dt)
    grads[s.depth + 1] = (_dot_acc(trunk, g_w_c),
                          jnp.sum(g_w, axis=0, keepdims=True))
    grads[s.depth + 2] = (_dot_acc(trunk, g_v_c),
                          jnp.sum(g_v, axis=0, keepdims=True))
    g_trunk = (_dot_t(g_w_c, wbs[s.depth + 1][0])
               + _dot_t(g_v_c, wbs[s.depth + 2][0])).astype(dt)
    yield

    grads[s.depth] = (_dot_acc(logit_in, g_trunk),
                      jnp.sum(g_trunk.astype(jnp.float32), axis=0,
                              keepdims=True))
    yield
    gh = _dot_t(g_trunk, wbs[s.depth][0]).astype(dt)
    yield

    g_enc_acc = jnp.zeros((t, s.enc_pad), jnp.float32)
    if (s.depth - 1) in s.skips:
        g_enc_acc += gh[:, s.w_pad:].astype(jnp.float32)
        gh = gh[:, :s.w_pad]
    for i in range(s.depth - 1, -1, -1):
        gh = jnp.where(outs[i].astype(jnp.float32) > 0, gh, 0).astype(dt)
        grads[i] = (_dot_acc(ins[i], gh),
                    jnp.sum(gh.astype(jnp.float32), axis=0, keepdims=True))
        yield
        gh = _dot_t(gh, wbs[i][0]).astype(dt)
        yield
        if i > 0 and (i - 1) in s.skips:
            g_enc_acc += gh[:, s.w_pad:].astype(jnp.float32)
            gh = gh[:, :s.w_pad]
    g_enc_acc += gh.astype(jnp.float32)
    dx_raw = yield from _encode_bwd_gen(s, x_raw, g_enc_acc, scales,
                                        trig=trig)
    return dx_raw, grads


def _backward_tile(spec: FusedSE3Spec, x_raw, g_wv, wbs, scales=None,
                   fwd_vals=None):
    """g_wv: (T, OUT_PAD) fp32 packed [g_w(3) | g_v(3) | 0]."""
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_backward_tile_gen(spec, x_raw, g_wv, wbs, scales,
                                    fwd_vals))


def _weight_specs(padded_wbs):
    w_in, w_specs = [], []
    for w, b in padded_wbs:
        w_in += [w, b]
        w_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    return w_in, w_specs


def _make_fwd_kernel(spec: FusedSE3Spec):
    s = spec

    def kernel(*refs):
        x_ref = refs[0]
        off = 1
        scales = refs[off][:] if s.windowed else None
        off += 1 if s.windowed else 0
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(s.n_layers)]
        out_ref = refs[off + 2 * s.n_layers]
        *_, w_out, v_out = _forward_tile(s, x_ref[:], wbs, scales)
        t = w_out.shape[0]
        out_ref[:] = jnp.concatenate(
            [w_out[:, :3], v_out[:, :3],
             jnp.zeros((t, OUT_PAD - 6), jnp.float32)], axis=-1)
    return kernel


def _make_bwd_kernel(spec: FusedSE3Spec):
    s = spec

    def kernel(*refs):
        x_ref = refs[0]
        off = 1
        scales = refs[off][:] if s.windowed else None
        off += 1 if s.windowed else 0
        g_ref = refs[off]; off += 1
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
        dx_raw, grads = _backward_tile(s, x_raw, g_ref[:], wbs,
                                       scales=scales)
        pad = x_raw.shape[1] - dx_raw.shape[1]
        if pad:
            dx_raw = jnp.concatenate(
                [dx_raw, jnp.zeros((x_raw.shape[0], pad), jnp.float32)], -1)
        dx_ref[:] = dx_raw.astype(dx_ref.dtype)
        for k, (dw, db) in enumerate(grads):
            dwb_refs[2 * k][:] += dw
            dwb_refs[2 * k + 1][:] += db
    return kernel


def _scales_specs(spec, scales):
    if not spec.windowed:
        return [], []
    return [scales], [pl.BlockSpec((1, scales.shape[1]), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(spec, x_raw, scales, padded_flat):
    s = spec
    p = x_raw.shape[0]
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    sc_in, sc_specs = _scales_specs(s, scales)
    w_in, w_specs = _weight_specs(padded_wbs)
    data_spec = pl.BlockSpec((s.tile, x_raw.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fwd_kernel(s),
        grid=(p // s.tile,),
        in_specs=[data_spec] + sc_specs + w_specs,
        out_specs=pl.BlockSpec((s.tile, OUT_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, OUT_PAD), jnp.float32),
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(x_raw, *sc_in, *w_in)


def _fused_fwd(spec, x_raw, scales, padded_flat):
    return _fused(spec, x_raw, scales, padded_flat), (x_raw, scales,
                                                      padded_flat)


def _fused_bwd(spec, res, g):
    x_raw, scales, padded_flat = res
    s = spec._replace(tile=spec.bwd_tile or spec.tile)
    p = x_raw.shape[0]
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    sc_in, sc_specs = _scales_specs(s, scales)
    w_in, w_specs = _weight_specs(padded_wbs)
    data_spec = pl.BlockSpec((s.tile, x_raw.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((s.tile, OUT_PAD), lambda i: (i, 0),
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


def se3_params_to_list(params) -> list:
    """Flatten SE3Field params (trunk/w_net/v_net MLP trees) into the fused
    kernel's (W, b) ordering."""
    trunk = params['trunk']
    depth = len([k for k in trunk if k.startswith('hidden_')])
    pairs = [(trunk[f'hidden_{i}']['kernel'], trunk[f'hidden_{i}']['bias'])
             for i in range(depth)]
    pairs.append((trunk['logit']['kernel'], trunk['logit']['bias']))
    pairs.append((params['w_net']['logit']['kernel'],
                  params['w_net']['logit']['bias']))
    pairs.append((params['v_net']['logit']['kernel'],
                  params['v_net']['logit']['bias']))
    return pairs


def fused_se3_wv(spec: FusedSE3Spec, points, embed, pairs,
                 enc_scales=None):
    """Evaluate the SE(3) trunk: (points, embed) -> (w, v), each (P, 3) fp32.

    The caller applies ops/rigid_body.exp_se3_from_wv + transform_points.
    enc_scales: (1, enc_pad) warp_alpha window row (requires spec.windowed).
    """
    s = spec
    assert (enc_scales is not None) == s.windowed
    p = points.shape[0]
    import math as _math
    granularity = _math.lcm(s.tile, s.bwd_tile or s.tile)
    p_pad = _rup(p, granularity)

    parts = [points.astype(jnp.float32)]
    if s.use_metadata:
        parts.append(embed.astype(jnp.float32))
    parts.append(jnp.zeros((p, RAW_PAD - s.raw_ch), jnp.float32))
    x_raw = jnp.concatenate(parts, axis=-1)
    if p_pad != p:
        x_raw = jnp.pad(x_raw, ((0, p_pad - p), (0, 0)))

    padded = _pad_params(s, pairs)
    padded_flat = tuple(a for wb in padded for a in wb)
    out = _fused(s, x_raw, enc_scales, padded_flat)[:p]
    return out[:, :3], out[:, 3:6]
