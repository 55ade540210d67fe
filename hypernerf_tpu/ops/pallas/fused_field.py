"""Fused field MLP: in-kernel positional encoding + skip-MLP, one output head.

Serves the warp field (TranslationField: posenc_orig(points, 10) ++ embed ->
6x128 MLP -> 3) and the hyper sheet (posenc_orig(points, 7) ++ embed -> 6x64
-> 4) — models/warping.py / models/modules.py. Unlike the template kernel
(fused_mlp.py) the positional encoding happens *inside* the kernel: the raw
input is only (P, 3+E) and neither the encoded features nor any activation
ever reaches HBM.

Input layout: one raw array (P, sum(seg_ch)) whose segments are encoded
independently — segments with n_freq > 0 get [x | sin bands | cos bands]
(ops/posenc.py layout), n_freq == 0 passes through (the GLO embedding).
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

LANE = 128
OUT_PAD = 8


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedFieldSpec(NamedTuple):
    """Static config. segments: ((channels, n_freqs), ...)."""
    segments: Tuple[Tuple[int, int], ...]
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

    @property
    def raw_ch(self) -> int:
        return sum(c for c, _ in self.segments)

    @property
    def enc_ch(self) -> int:
        return sum(c * (1 + 2 * f) for c, f in self.segments)

    @property
    def enc_pad(self) -> int:
        return _rup(self.enc_ch, LANE)

    @property
    def w_pad(self) -> int:
        return _rup(self.width, LANE)


def _band_matrix(ch: int, n_freq: int):
    """(ch, n_freq*ch) with [c, k*ch+c] = 2^k: band expansion as one matmul.

    Per-band elementwise expansion (tile + multiply) lowers to dozens of
    lane-starved (T, 3) ops in Mosaic; a K=3 matmul rides the MXU instead.
    Built from iota (Pallas kernels cannot capture array constants).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (ch, n_freq * ch), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ch, n_freq * ch), 1)
    freq = jnp.exp2((cols // ch).astype(jnp.float32))
    return jnp.where(cols % ch == rows, freq, 0.0)


def _encode(spec: FusedFieldSpec, x):
    """Per-segment posenc_orig in VMEM; returns (T, enc_pad) compute-dtype."""
    dt = jnp.dtype(spec.compute_dtype)
    parts = []
    start = 0
    for ch, n_freq in spec.segments:
        seg = x[:, start:start + ch].astype(jnp.float32)
        start += ch
        if n_freq == 0:
            parts.append(seg.astype(dt))
            continue
        xb = jax.lax.dot_general(
            seg, _band_matrix(ch, n_freq),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        parts += [seg.astype(dt), jnp.sin(xb).astype(dt),
                  jnp.cos(xb).astype(dt)]
    pad = spec.enc_pad - spec.enc_ch
    if pad:
        parts.append(jnp.zeros((x.shape[0], pad), dt))
    return jnp.concatenate(parts, axis=-1)


def _encode_bwd(spec: FusedFieldSpec, x, g_enc):
    """VJP of _encode: (T, enc_pad) cotangent -> (T, raw_ch)."""
    parts = []
    start_raw = 0
    start_enc = 0
    for ch, n_freq in spec.segments:
        seg = x[:, start_raw:start_raw + ch].astype(jnp.float32)
        start_raw += ch
        width = ch * (1 + 2 * n_freq)
        g_seg = g_enc[:, start_enc:start_enc + width].astype(jnp.float32)
        start_enc += width
        if n_freq == 0:
            parts.append(g_seg)
            continue
        band = _band_matrix(ch, n_freq)
        xb = jax.lax.dot_general(seg, band, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g_sin = g_seg[:, ch:ch + n_freq * ch]
        g_cos = g_seg[:, ch + n_freq * ch:]
        flat = jnp.cos(xb) * g_sin - jnp.sin(xb) * g_cos
        # Contract back with the band matrix (freqs folded in) on the MXU.
        dx = jax.lax.dot_general(flat, band, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        parts.append(g_seg[:, :ch] + dx)
    return jnp.concatenate(parts, axis=-1)


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


def _forward_tile(spec: FusedFieldSpec, x_raw, wbs):
    dt = jnp.dtype(spec.compute_dtype)
    enc = _encode(spec, x_raw)
    ins, outs = [], []
    h = enc
    for i in range(spec.depth):
        w, b = wbs[i]
        ins.append(h)
        h = jnp.maximum(_dot(h, w) + b.astype(jnp.float32), 0.0).astype(dt)
        outs.append(h)
        if i in spec.skips:
            h = jnp.concatenate([h, enc], axis=-1)
    w, b = wbs[spec.depth]
    logit_in = h
    out = _dot(h, w) + b.astype(jnp.float32)  # (T, OUT_PAD) fp32
    return enc, ins, outs, logit_in, out


def _make_fwd_kernel(spec: FusedFieldSpec, n_layers: int):
    def kernel(*refs):
        x_ref = refs[0]
        wbs = [(refs[1 + 2 * k][:], refs[1 + 2 * k + 1][:])
               for k in range(n_layers)]
        out_ref = refs[1 + 2 * n_layers]
        *_, out = _forward_tile(spec, x_ref[:], wbs)
        out_ref[:] = out
    return kernel


def _backward_tile(spec: FusedFieldSpec, x_raw, g_out, wbs, fwd_vals=None):
    """Recompute + backprop one tile (pure values, reusable by other kernels).

    ``fwd_vals`` may carry a precomputed ``_forward_tile`` result to avoid a
    duplicate recompute when the caller already ran the forward in this tile.

    Returns (dx_raw (T, raw_ch) fp32, [(dW, db) fp32 per layer]).
    """
    s = spec
    dt = jnp.dtype(s.compute_dtype)
    if fwd_vals is None:
        fwd_vals = _forward_tile(s, x_raw, wbs)
    enc, ins, outs, logit_in, _ = fwd_vals
    t = x_raw.shape[0]
    grads = [None] * (s.depth + 1)

    def acc(k, dw, db):
        grads[k] = (dw, db)

    g_out_c = g_out.astype(dt)
    acc(s.depth, _dot_acc(logit_in, g_out_c),
        jnp.sum(g_out, axis=0, keepdims=True))
    gh = _dot_t(g_out_c, wbs[s.depth][0]).astype(dt)

    g_enc_acc = jnp.zeros((t, s.enc_pad), jnp.float32)
    if (s.depth - 1) in s.skips:
        g_enc_acc += gh[:, s.w_pad:].astype(jnp.float32)
        gh = gh[:, :s.w_pad]
    for i in range(s.depth - 1, -1, -1):
        gh = jnp.where(outs[i].astype(jnp.float32) > 0, gh, 0).astype(dt)
        acc(i, _dot_acc(ins[i], gh),
            jnp.sum(gh.astype(jnp.float32), axis=0, keepdims=True))
        gh = _dot_t(gh, wbs[i][0]).astype(dt)
        if i > 0 and (i - 1) in s.skips:
            g_enc_acc += gh[:, s.w_pad:].astype(jnp.float32)
            gh = gh[:, :s.w_pad]
    g_enc_acc += gh.astype(jnp.float32)
    dx_raw = _encode_bwd(s, x_raw[:, :s.raw_ch], g_enc_acc)
    return dx_raw, grads


def _make_bwd_kernel(spec: FusedFieldSpec, n_layers: int):
    s = spec

    def kernel(*refs):
        x_ref = refs[0]
        g_ref = refs[1]
        wbs = [(refs[2 + 2 * k][:], refs[2 + 2 * k + 1][:])
               for k in range(n_layers)]
        o = 2 + 2 * n_layers
        dx_ref = refs[o]
        dwb_refs = refs[o + 1:o + 1 + 2 * n_layers]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in dwb_refs:
                r[:] = jnp.zeros(r.shape, r.dtype)

        x_raw = x_ref[:]
        dx_raw, grads = _backward_tile(s, x_raw, g_ref[:], wbs)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(spec, x_raw, padded_flat):
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    p = x_raw.shape[0]
    data_spec, w_in, w_specs = _common_specs(spec, p, x_raw, padded_wbs)
    return pl.pallas_call(
        _make_fwd_kernel(spec, len(padded_wbs)),
        grid=(p // spec.tile,),
        in_specs=[data_spec] + w_specs,
        out_specs=pl.BlockSpec((spec.tile, OUT_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, OUT_PAD), jnp.float32),
        interpret=spec.interpret,
    )(x_raw, *w_in)


def _fused_fwd(spec, x_raw, padded_flat):
    return _fused(spec, x_raw, padded_flat), (x_raw, padded_flat)


def _fused_bwd(spec, res, g):
    x_raw, padded_flat = res
    spec = spec._replace(tile=spec.bwd_tile or spec.tile)
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    p = x_raw.shape[0]
    data_spec, w_in, w_specs = _common_specs(spec, p, x_raw, padded_wbs)
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
        in_specs=[data_spec, g_spec] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=spec.interpret,
    )(x_raw, g, *w_in)
    dx = outs[0].astype(x_raw.dtype)
    dflat = tuple(outs[1 + k].astype(padded_flat[k].dtype)
                  for k in range(len(padded_flat)))
    return dx, dflat


_fused.defvjp(_fused_fwd, _fused_bwd)


def mlp_params_to_list(params) -> list:
    """Flatten an MLP param tree (models/modules.py MLP) into (W, b) pairs."""
    depth = len([k for k in params if k.startswith('hidden_')])
    pairs = [(params[f'hidden_{i}']['kernel'], params[f'hidden_{i}']['bias'])
             for i in range(depth)]
    pairs.append((params['logit']['kernel'], params['logit']['bias']))
    return pairs


def fused_field_mlp(spec: FusedFieldSpec, x_raw, pairs):
    """Evaluate posenc+MLP for raw per-sample inputs.

    Args:
      spec: static FusedFieldSpec.
      x_raw: (P, raw_ch) raw inputs, segments concatenated (e.g. [pts|embed]).
      pairs: (W, b) list in MLP order (hidden_0..hidden_{D-1}, logit),
        unpadded.

    Returns:
      (P, out_ch) fp32 output (no output activation).
    """
    s = spec
    p = x_raw.shape[0]
    import math as _math
    granularity = _math.lcm(s.tile, s.bwd_tile or s.tile)
    p_pad = _rup(p, granularity)
    x_in = x_raw.astype(jnp.float32)
    if p_pad != p:
        x_in = jnp.pad(x_in, ((0, p_pad - p), (0, 0)))
    padded = _pad_params(s, pairs)
    padded_flat = tuple(a for wb in padded for a in wb)
    out = _fused(s, x_in, padded_flat)
    return out[:p, :s.out_ch]
