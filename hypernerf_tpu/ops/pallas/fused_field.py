"""Fused field MLP: in-kernel positional encoding + skip-MLP, one output head.

Serves the warp field (TranslationField: posenc_orig(points, 10) ++ embed ->
6x128 MLP -> 3) and the hyper sheet (posenc_orig(points, 7) ++ embed -> 6x64
-> 4) — models/warping.py / models/modules.py. Unlike the template kernel
(fused_mlp.py) the positional encoding happens *inside* the kernel: the raw
input is only (P, 3+E) and neither the encoded features nor any activation
ever reaches HBM.

Input layout: one raw array (P, sum(seg_ch)) whose segments are encoded
independently. A segment is (ch, n_freq) — posenc_orig: [x | sin bands |
cos bands] over 2^0..2^(n_freq-1), n_freq == 0 passes raw features through
(the GLO embedding) — or the long form (ch, n_freq, min_deg, use_identity)
for the Nerfies encoding (bands 2^min_deg.., optional identity block).

Coarse-to-fine annealing (the Hann window over bands, ops/posenc.py
posenc_window) runs IN-KERNEL: when ``spec.windowed`` the kernel takes one
extra (1, enc_pad) fp32 row of per-feature scales (identity features 1.0,
sin/cos features the per-band window weight) multiplied into the encoding;
the backward scales the encoding cotangent identically (the window is a
schedule constant, d/dx (s*sin(fx)) = s*f*cos(fx)). Scales are built by
``encoding_scales`` from the per-segment alphas — so the annealed model runs
the SAME fused kernels as the fully-on one.

The backward recomputes the forward per tile and applies the analytic posenc
VJP per segment, accumulating fp32 dW/db across the sequential grid.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hypernerf_tpu.ops.pallas.common import vmem_params

LANE = 128
OUT_PAD = 8


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def norm_seg(seg) -> Tuple[int, int, int, bool]:
    """Normalize a segment to (ch, n_freq, min_deg, use_identity).

    Short form (ch, n_freq) is posenc_orig: bands 2^0..2^(n_freq-1) with the
    identity block. The long form expresses the Nerfies posenc (arbitrary
    min_deg, optional identity). n_freq == 0 = raw pass-through.
    """
    if len(seg) == 2:
        return (seg[0], seg[1], 0, True)
    return (seg[0], seg[1], seg[2], bool(seg[3]))


def seg_enc_ch(seg) -> int:
    ch, f, _, ident = norm_seg(seg)
    if f == 0:
        return ch
    return ch * ((1 if ident else 0) + 2 * f)


class FusedFieldSpec(NamedTuple):
    """Static config. segments: ((ch, n_freq) | (ch, n_freq, min_deg,
    use_identity), ...)."""
    segments: Tuple[Tuple, ...]
    depth: int = 6
    width: int = 128
    out_ch: int = 3
    skips: Tuple[int, ...] = (4,)
    tile: int = 1024
    interpret: bool = False
    compute_dtype: str = 'bfloat16'
    # Backward recompute keeps all activations of a tile live in VMEM, so it
    # needs a smaller tile than the forward (0 = same as tile).
    bwd_tile: int = 0
    # Take a (1, enc_pad) per-feature scale row (the annealing window).
    windowed: bool = False
    # Hidden-layer epilogues (bias+relu) in the compute dtype instead of
    # fp32 (see fused_mlp.FusedMLPSpec.bf16_epilogue).
    bf16_epilogue: bool = False

    @property
    def raw_ch(self) -> int:
        return sum(norm_seg(s)[0] for s in self.segments)

    @property
    def enc_ch(self) -> int:
        return sum(seg_enc_ch(s) for s in self.segments)

    @property
    def enc_pad(self) -> int:
        return _rup(self.enc_ch, LANE)

    @property
    def w_pad(self) -> int:
        return _rup(self.width, LANE)


def _band_matrix(ch: int, n_freq: int, min_deg: int = 0):
    """(ch, n_freq*ch) with [c, k*ch+c] = 2^(min_deg+k): band expansion as one
    matmul.

    Per-band elementwise expansion (tile + multiply) lowers to dozens of
    lane-starved (T, 3) ops in Mosaic; a K=3 matmul rides the MXU instead.
    Built from iota (Pallas kernels cannot capture array constants).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (ch, n_freq * ch), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ch, n_freq * ch), 1)
    freq = jnp.exp2((cols // ch + min_deg).astype(jnp.float32))
    return jnp.where(cols % ch == rows, freq, 0.0)


def encoding_scales(segments, alphas, dtype=jnp.float32):
    """Per-feature annealing scales for ``segments``: a (1, enc_pad) row.

    ``alphas``: one entry per segment — None (fully on) or the posenc_window
    alpha easing bands in as it goes 0 -> n_freq (ops/posenc.py
    posenc_window / model_utils.py:282-298). Identity features scale 1.
    Built OUTSIDE the kernel (host/XLA) and passed as an input.
    """
    from hypernerf_tpu.ops.posenc import posenc_window
    parts = []
    for seg, alpha in zip(segments, alphas):
        ch, f, min_deg, ident = norm_seg(seg)
        if f == 0:
            parts.append(jnp.ones((ch,), dtype))
            continue
        if ident:
            parts.append(jnp.ones((ch,), dtype))
        if alpha is None:
            band = jnp.ones((f,), dtype)
        else:
            band = posenc_window(min_deg, min_deg + f, alpha).astype(dtype)
        band = jnp.repeat(band, ch)
        parts += [band, band]
    flat = jnp.concatenate(parts)
    enc_ch = flat.shape[0]
    return jnp.pad(flat, (0, _rup(enc_ch, LANE) - enc_ch))[None, :]


def _band_trig_gen(seg_x, ch: int, n_freq: int, min_deg: int = 0):
    """Generator form of _band_trig: yields between the band matmul and
    each transcendental so an interleaved co-stream (common.interleave) can
    slot MXU work into the long VPU stretches."""
    band = _band_matrix(ch, n_freq, min_deg)
    xbt = jax.lax.dot_general(band, seg_x, (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    yield
    nb = n_freq * ch
    pad = (-nb) % 8
    if pad:
        xbt = jnp.concatenate(
            [xbt, jnp.zeros((pad, seg_x.shape[0]), jnp.float32)], axis=0)
    sin_t = jnp.sin(xbt)
    yield
    cos_t = jnp.cos(xbt)
    yield
    sc = jnp.concatenate([sin_t, cos_t], axis=0).T
    return sc[:, :nb], sc[:, nb + pad:2 * nb + pad]


def _band_trig(seg_x, ch: int, n_freq: int, min_deg: int = 0):
    """fp32 (sin, cos) of the band products, each (T, n_freq*ch).

    Computed TRANSPOSED: the band matmul lands as (bands, T) so the
    sin/cos run on full 128-lane rows instead of n_freq*ch of 128 lanes
    (measured 31% faster for the whole encode at 30 bands), then one
    cheap lane-padded transpose back. Bit-identical to the row-major
    form: the K=3 contraction is the same sum either way.
    """
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_band_trig_gen(seg_x, ch, n_freq, min_deg))


def _encode_gen(spec: FusedFieldSpec, x, scales=None, trig=None,
                return_trig=False):
    """Generator form of _encode (yields inside each segment's band trig)."""
    dt = jnp.dtype(spec.compute_dtype)
    parts = []
    trig_out = []
    start = 0
    for k, seg in enumerate(spec.segments):
        ch, n_freq, min_deg, ident = norm_seg(seg)
        seg_x = x[:, start:start + ch].astype(jnp.float32)
        start += ch
        if n_freq == 0:
            parts.append(seg_x.astype(dt))
            trig_out.append(None)
            continue
        if trig is not None and trig[k] is not None:
            sin_xb, cos_xb = trig[k]
        else:
            sin_xb, cos_xb = yield from _band_trig_gen(seg_x, ch, n_freq,
                                                       min_deg)
        trig_out.append((sin_xb, cos_xb))
        if ident:
            parts.append(seg_x.astype(dt))
        parts += [sin_xb.astype(dt), cos_xb.astype(dt)]
    pad = spec.enc_pad - spec.enc_ch
    if pad:
        parts.append(jnp.zeros((x.shape[0], pad), dt))
    enc = jnp.concatenate(parts, axis=-1)
    if scales is not None:
        enc = (enc.astype(jnp.float32) * scales.astype(jnp.float32)).astype(dt)
    if return_trig:
        return enc, trig_out
    return enc


def _encode(spec: FusedFieldSpec, x, scales=None, trig=None,
            return_trig=False):
    """Per-segment posenc in VMEM; returns (T, enc_pad) compute-dtype.

    ``scales``: optional (1, enc_pad) fp32 per-feature window weights.
    ``trig``: optional per-segment [(sin_xb, cos_xb) fp32 | None] — reuses
    band trig already computed on the same points (e.g. the hyper sheet
    slicing the warp field's lower bands) instead of evaluating sin/cos.
    ``return_trig`` additionally returns that list for this call, so the
    backward (``_encode_bwd``) can reuse the fp32 values the recompute
    already produced — bit-identical and roughly half the kernel's
    transcendentals.
    """
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_encode_gen(spec, x, scales, trig, return_trig))


def _encode_bwd_gen(spec: FusedFieldSpec, x, g_enc, scales=None, trig=None):
    """Generator form of _encode_bwd (yields per segment contraction)."""
    if scales is not None:
        g_enc = g_enc.astype(jnp.float32) * scales.astype(jnp.float32)
    parts = []
    start_raw = 0
    start_enc = 0
    for k, seg in enumerate(spec.segments):
        ch, n_freq, min_deg, ident = norm_seg(seg)
        seg_x = x[:, start_raw:start_raw + ch].astype(jnp.float32)
        start_raw += ch
        width = seg_enc_ch(seg)
        g_seg = g_enc[:, start_enc:start_enc + width].astype(jnp.float32)
        start_enc += width
        if n_freq == 0:
            parts.append(g_seg)
            continue
        band = _band_matrix(ch, n_freq, min_deg)
        if trig is not None and trig[k] is not None:
            sin_xb, cos_xb = trig[k]
        else:
            sin_xb, cos_xb = yield from _band_trig_gen(seg_x, ch, n_freq,
                                                       min_deg)
        off = ch if ident else 0
        g_sin = g_seg[:, off:off + n_freq * ch]
        g_cos = g_seg[:, off + n_freq * ch:]
        flat = cos_xb * g_sin - sin_xb * g_cos
        yield
        # Contract back with the band matrix (freqs folded in) on the MXU.
        dx = jax.lax.dot_general(flat, band, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        yield
        parts.append((g_seg[:, :ch] + dx) if ident else dx)
    return jnp.concatenate(parts, axis=-1)


def _encode_bwd(spec: FusedFieldSpec, x, g_enc, scales=None, trig=None):
    """VJP of _encode: (T, enc_pad) cotangent -> (T, raw_ch).

    ``trig``: optional per-segment [(sin_xb, cos_xb) fp32 | None] from the
    forward recompute (``_encode(..., return_trig=True)``) — skips
    re-evaluating the band matmul and sin/cos with bit-identical results.
    """
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_encode_bwd_gen(spec, x, g_enc, scales, trig))


def _layer_row_segs(spec: FusedFieldSpec):
    """Per-layer (orig_rows_segments, out_orig, out_pad)."""
    s = spec
    defs = []
    enc_seg = [(s.enc_ch, s.enc_pad)]
    for i in range(s.depth):
        segs = list(enc_seg) if i == 0 else [(s.width, s.w_pad)]
        if i > 0 and (i - 1) in s.skips:
            segs.extend(enc_seg)
        defs.append((segs, s.width, s.w_pad))
    segs = [(s.width, s.w_pad)]
    if (s.depth - 1) in s.skips:
        segs.extend(enc_seg)
    defs.append((segs, s.out_ch, OUT_PAD))
    return defs


def _pad_params(spec: FusedFieldSpec, pairs):
    dt = jnp.dtype(spec.compute_dtype)
    defs = _layer_row_segs(spec)
    assert len(defs) == len(pairs), (len(defs), len(pairs))
    padded = []
    for (segs, out_orig, out_pad), (w, b) in zip(defs, pairs):
        rows = []
        start = 0
        for orig, pad in segs:
            rows.append(jnp.pad(w[start:start + orig],
                                ((0, pad - orig), (0, 0))))
            start += orig
        wp = jnp.concatenate(rows, 0) if len(rows) > 1 else rows[0]
        wp = jnp.pad(wp, ((0, 0), (0, out_pad - out_orig))).astype(dt)
        bp = jnp.pad(b, (0, out_pad - out_orig)).astype(dt)[None, :]
        padded.append((wp, bp))
    return padded


def _dot(a, w):
    return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t(g, w):
    return jax.lax.dot_general(g, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_acc(h, g):
    return jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _forward_tile_gen(spec: FusedFieldSpec, x_raw, wbs, scales=None,
                      trig=None):
    """Generator form of _forward_tile: yields at op-group boundaries so
    pipelined kernels can interleave this stream with an independent tile
    (common.interleave). Returns the same tuple as _forward_tile."""
    dt = jnp.dtype(spec.compute_dtype)
    enc, trig = yield from _encode_gen(spec, x_raw, scales, trig=trig,
                                       return_trig=True)
    yield
    ins, outs = [], []
    h = enc
    for i in range(spec.depth):
        w, b = wbs[i]
        ins.append(h)
        from hypernerf_tpu.ops.pallas.fused_mlp import _dot_act
        h = _dot_act(h, w, b, dt, epi_in_dt=spec.bf16_epilogue)
        yield
        outs.append(h)
        if i in spec.skips:
            h = jnp.concatenate([h, enc], axis=-1)
    w, b = wbs[spec.depth]
    logit_in = h
    out = _dot(h, w) + b.astype(jnp.float32)  # (T, OUT_PAD) fp32
    return enc, trig, ins, outs, logit_in, out


def _forward_tile(spec: FusedFieldSpec, x_raw, wbs, scales=None, trig=None):
    """One tile forward. ``trig`` optionally injects precomputed band
    sin/cos (see _encode); the returned tuple carries this tile's trig so
    backward passes can reuse it."""
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_forward_tile_gen(spec, x_raw, wbs, scales, trig))


def _make_fwd_kernel(spec: FusedFieldSpec, n_layers: int):
    def kernel(*refs):
        x_ref = refs[0]
        off = 1
        scales = refs[off][:] if spec.windowed else None
        off += 1 if spec.windowed else 0
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(n_layers)]
        out_ref = refs[off + 2 * n_layers]
        *_, out = _forward_tile(spec, x_ref[:], wbs, scales)
        out_ref[:] = out
    return kernel


def _backward_tile_gen(spec: FusedFieldSpec, x_raw, g_out, wbs,
                       fwd_vals=None, scales=None, trig=None):
    """Generator form of _backward_tile (yields at op-group boundaries)."""
    s = spec
    dt = jnp.dtype(s.compute_dtype)
    if fwd_vals is None:
        fwd_vals = yield from _forward_tile_gen(s, x_raw, wbs, scales,
                                                trig=trig)
    enc, trig, ins, outs, logit_in, _ = fwd_vals
    t = x_raw.shape[0]
    grads = [None] * (s.depth + 1)

    def acc(k, dw, db):
        grads[k] = (dw, db)

    g_out_c = g_out.astype(dt)
    acc(s.depth, _dot_acc(logit_in, g_out_c),
        jnp.sum(g_out, axis=0, keepdims=True))
    gh = _dot_t(g_out_c, wbs[s.depth][0]).astype(dt)
    yield

    g_enc_acc = jnp.zeros((t, s.enc_pad), jnp.float32)
    if (s.depth - 1) in s.skips:
        g_enc_acc += gh[:, s.w_pad:].astype(jnp.float32)
        gh = gh[:, :s.w_pad]
    for i in range(s.depth - 1, -1, -1):
        gh = jnp.where(outs[i].astype(jnp.float32) > 0, gh, 0).astype(dt)
        acc(i, _dot_acc(ins[i], gh),
            jnp.sum(gh.astype(jnp.float32), axis=0, keepdims=True))
        yield
        gh = _dot_t(gh, wbs[i][0]).astype(dt)
        yield
        if i > 0 and (i - 1) in s.skips:
            g_enc_acc += gh[:, s.w_pad:].astype(jnp.float32)
            gh = gh[:, :s.w_pad]
    g_enc_acc += gh.astype(jnp.float32)
    dx_raw = yield from _encode_bwd_gen(s, x_raw[:, :s.raw_ch], g_enc_acc,
                                        scales, trig=trig)
    return dx_raw, grads


def _backward_tile(spec: FusedFieldSpec, x_raw, g_out, wbs, fwd_vals=None,
                   scales=None, trig=None):
    """Recompute + backprop one tile (pure values, reusable by other kernels).

    ``fwd_vals`` may carry a precomputed ``_forward_tile`` result to avoid a
    duplicate recompute when the caller already ran the forward in this tile.
    ``trig`` optionally injects shared band sin/cos into the recompute.

    Returns (dx_raw (T, raw_ch) fp32, [(dW, db) fp32 per layer]).
    """
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_backward_tile_gen(spec, x_raw, g_out, wbs, fwd_vals,
                                    scales, trig))


def _make_bwd_kernel(spec: FusedFieldSpec, n_layers: int):
    s = spec

    def kernel(*refs):
        x_ref = refs[0]
        off = 1
        scales = refs[off][:] if s.windowed else None
        off += 1 if s.windowed else 0
        g_ref = refs[off]; off += 1
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(n_layers)]
        o = off + 2 * n_layers
        dx_ref = refs[o]
        dwb_refs = refs[o + 1:o + 1 + 2 * n_layers]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in dwb_refs:
                r[:] = jnp.zeros(r.shape, r.dtype)

        x_raw = x_ref[:]
        dx_raw, grads = _backward_tile(s, x_raw, g_ref[:], wbs,
                                       scales=scales)
        pad = x_raw.shape[1] - s.raw_ch
        if pad:
            dx_raw = jnp.concatenate(
                [dx_raw, jnp.zeros((x_raw.shape[0], pad), jnp.float32)], -1)
        dx_ref[:] = dx_raw.astype(dx_ref.dtype)
        for k, (dw, db) in enumerate(grads):
            dwb_refs[2 * k][:] += dw
            dwb_refs[2 * k + 1][:] += db
    return kernel


def _common_specs(spec, p, x_raw, padded_wbs):
    data_spec = pl.BlockSpec((spec.tile, x_raw.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    w_in, w_specs = [], []
    for w, b in padded_wbs:
        w_in += [w, b]
        w_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    return data_spec, w_in, w_specs


def _scales_spec(spec):
    return pl.BlockSpec((1, spec.enc_pad), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(spec, x_raw, scales, padded_flat):
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    p = x_raw.shape[0]
    data_spec, w_in, w_specs = _common_specs(spec, p, x_raw, padded_wbs)
    s_in = [scales] if spec.windowed else []
    s_specs = [_scales_spec(spec)] if spec.windowed else []
    return pl.pallas_call(
        _make_fwd_kernel(spec, len(padded_wbs)),
        grid=(p // spec.tile,),
        in_specs=[data_spec] + s_specs + w_specs,
        out_specs=pl.BlockSpec((spec.tile, OUT_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, OUT_PAD), jnp.float32),
        interpret=spec.interpret,
        compiler_params=vmem_params(spec.interpret),
    )(x_raw, *s_in, *w_in)


def _fused_fwd(spec, x_raw, scales, padded_flat):
    return _fused(spec, x_raw, scales, padded_flat), (x_raw, scales,
                                                      padded_flat)


def _fused_bwd(spec, res, g):
    x_raw, scales, padded_flat = res
    spec = spec._replace(tile=spec.bwd_tile or spec.tile)
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    p = x_raw.shape[0]
    data_spec, w_in, w_specs = _common_specs(spec, p, x_raw, padded_wbs)
    s_in = [scales] if spec.windowed else []
    s_specs = [_scales_spec(spec)] if spec.windowed else []
    g_spec = pl.BlockSpec((spec.tile, OUT_PAD), lambda i: (i, 0),
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
        _make_bwd_kernel(spec, len(padded_wbs)),
        grid=(p // spec.tile,),
        in_specs=[data_spec] + s_specs + [g_spec] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=spec.interpret,
        compiler_params=vmem_params(spec.interpret),
    )(x_raw, *s_in, g, *w_in)
    dx = outs[0].astype(x_raw.dtype)
    dflat = tuple(outs[1 + k].astype(padded_flat[k].dtype)
                  for k in range(len(padded_flat)))
    # The window scales are a schedule constant (no gradient).
    d_scales = None if scales is None else jnp.zeros_like(scales)
    return dx, d_scales, dflat


_fused.defvjp(_fused_fwd, _fused_bwd)


def mlp_params_to_list(params) -> list:
    """Flatten an MLP param tree (models/modules.py MLP) into (W, b) pairs."""
    depth = len([k for k in params if k.startswith('hidden_')])
    pairs = [(params[f'hidden_{i}']['kernel'], params[f'hidden_{i}']['bias'])
             for i in range(depth)]
    pairs.append((params['logit']['kernel'], params['logit']['bias']))
    return pairs


def fused_field_mlp(spec: FusedFieldSpec, x_raw, pairs, enc_scales=None):
    """Evaluate posenc+MLP for raw per-sample inputs.

    Args:
      spec: static FusedFieldSpec.
      x_raw: (P, raw_ch) raw inputs, segments concatenated (e.g. [pts|embed]).
      pairs: (W, b) list in MLP order (hidden_0..hidden_{D-1}, logit),
        unpadded.
      enc_scales: (1, enc_pad) per-feature window row (requires
        spec.windowed; build with ``encoding_scales``).

    Returns:
      (P, out_ch) fp32 output (no output activation).
    """
    s = spec
    assert (enc_scales is not None) == s.windowed
    p = x_raw.shape[0]
    import math as _math
    granularity = _math.lcm(s.tile, s.bwd_tile or s.tile)
    p_pad = _rup(p, granularity)
    x_in = x_raw.astype(jnp.float32)
    if p_pad != p:
        x_in = jnp.pad(x_in, ((0, p_pad - p), (0, 0)))
    padded = _pad_params(s, pairs)
    padded_flat = tuple(a for wb in padded for a in wb)
    out = _fused(s, x_in, enc_scales, padded_flat)
    return out[:p, :s.out_ch]
