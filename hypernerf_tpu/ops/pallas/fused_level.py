"""Fully fused HyperNeRF level: warp field + hyper sheet + template, ONE kernel.

The flagship configuration (translation warp + bendy-sheet slicing +
original-NeRF encodings, models.py render path) evaluates three MLPs per
sample. Running them as separate kernels leaves HBM round-trips and
serialization barriers between them; here the whole per-sample pipeline

    [points | warp embed] -> warp MLP -> warped = points + delta
                          -> hyper-sheet MLP -> hyper coords
    [warped | hyper] -> posenc -> template MLP -> (rgb, alpha)

runs inside one Pallas kernel per tile. The backward is one kernel too:
it recomputes the chain per tile and backpropagates through the template
(fused_mlp._backward_tile), both fields (fused_field._backward_tile), and the
residual warp connection, accumulating every fp32 dW/db across the grid.

Composes the tile-level building blocks of fused_mlp.py and fused_field.py;
parity is tested against the composed jnp modules.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hypernerf_tpu.ops.pallas import fused_field as ff
from hypernerf_tpu.ops.pallas import fused_mlp as fm

RAW_PAD = 16  # [points(3) | embed(E<=13)] padded lanes
OUT_PAD = 8


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedLevelSpec(NamedTuple):
    """Static config of the fused level (hashable)."""
    embed_ch: int = 8
    # warp field (TranslationField)
    warp_depth: int = 6
    warp_width: int = 128
    warp_freq: int = 10
    # hyper sheet
    hyper_depth: int = 6
    hyper_width: int = 64
    hyper_sheet_freq: int = 7
    hyper_out: int = 4
    # template
    xyz_freq: int = 10
    hyper_freq: int = 6
    trunk_depth: int = 8
    trunk_width: int = 256
    rgb_depth: int = 4
    rgb_width: int = 128
    rgb_channels: int = 3
    alpha_channels: int = 1
    rgb_cond_ch: int = 39
    alpha_cond_ch: int = 0
    skips: Tuple[int, ...] = (4,)
    tile: int = 1024
    bwd_tile: int = 256
    interpret: bool = False
    compute_dtype: str = 'bfloat16'
    # Split backward: run the template backward as its own kernel (reusing
    # fused_mlp's, at a larger tile since it doesn't hold the field stashes)
    # and a lean fields-backward kernel. The forward saves the template's
    # raw input (warped|hyper) so neither backward recomputes the other's
    # forward chain.
    split_bwd: bool = True
    tmpl_bwd_tile: int = 512

    @property
    def warp_fs(self) -> 'ff.FusedFieldSpec':
        return ff.FusedFieldSpec(
            segments=((3, self.warp_freq), (self.embed_ch, 0)),
            depth=self.warp_depth, width=self.warp_width, out_ch=3,
            skips=self.skips, compute_dtype=self.compute_dtype)

    @property
    def hyper_fs(self) -> 'ff.FusedFieldSpec':
        return ff.FusedFieldSpec(
            segments=((3, self.hyper_sheet_freq), (self.embed_ch, 0)),
            depth=self.hyper_depth, width=self.hyper_width,
            out_ch=self.hyper_out, skips=self.skips,
            compute_dtype=self.compute_dtype)

    @property
    def tmpl_fs(self) -> 'fm.FusedMLPSpec':
        in_ch = (3 * (1 + 2 * self.xyz_freq)
                 + self.hyper_out * (1 + 2 * self.hyper_freq))
        return fm.FusedMLPSpec(
            in_ch=in_ch, trunk_depth=self.trunk_depth,
            trunk_width=self.trunk_width, rgb_depth=self.rgb_depth,
            rgb_width=self.rgb_width, rgb_channels=self.rgb_channels,
            alpha_channels=self.alpha_channels, skips=self.skips,
            rgb_cond_ch=self.rgb_cond_ch, alpha_cond_ch=self.alpha_cond_ch,
            compute_dtype=self.compute_dtype,
            tile=self.tmpl_bwd_tile, bwd_tile=self.tmpl_bwd_tile,
            interpret=self.interpret,
            enc_segments=((3, self.xyz_freq),
                          (self.hyper_out, self.hyper_freq)))

    @property
    def n_warp_layers(self):
        return self.warp_depth + 1

    @property
    def n_hyper_layers(self):
        return self.hyper_depth + 1

    @property
    def n_tmpl_layers(self):
        return self.trunk_depth + 3 + self.rgb_depth + 1

    @property
    def n_layers(self):
        return self.n_warp_layers + self.n_hyper_layers + self.n_tmpl_layers


def _split_wbs(spec: FusedLevelSpec, wbs):
    nw, nh = spec.n_warp_layers, spec.n_hyper_layers
    return wbs[:nw], wbs[nw:nw + nh], wbs[nw + nh:]


def _forward_values(spec: FusedLevelSpec, x_raw, rgbc, alphac, wbs):
    """The fused chain on one tile; returns (rgb, alpha) raw fp32 heads."""
    s = spec
    warp_wbs, hyper_wbs, tmpl_wbs = _split_wbs(s, wbs)
    pts = x_raw[:, :3].astype(jnp.float32)
    raw_f = x_raw[:, :3 + s.embed_ch]
    *_, warp_out = ff._forward_tile(s.warp_fs, raw_f, warp_wbs)
    warped = pts + warp_out[:, :3]
    *_, hyper_out = ff._forward_tile(s.hyper_fs, raw_f, hyper_wbs)
    hyper = hyper_out[:, :s.hyper_out]
    raw_t = jnp.concatenate([warped, hyper], axis=-1)
    rgb, alpha, _ = fm._forward_tile(s.tmpl_fs, raw_t, rgbc, alphac, tmpl_wbs)
    return rgb, alpha, raw_t


def _make_fwd_kernel(spec: FusedLevelSpec, has_ac: bool):
    s = spec

    def kernel(*refs):
        x_ref, rgbc_ref = refs[0], refs[1]
        off = 2
        alphac_ref = refs[off] if has_ac else None
        off += 1 if has_ac else 0
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(s.n_layers)]
        out_ref = refs[off + 2 * s.n_layers]
        rawt_ref = refs[off + 2 * s.n_layers + 1]
        alphac = alphac_ref[:] if has_ac else None
        rgb, alpha, raw_t = _forward_values(s, x_ref[:], rgbc_ref[:], alphac,
                                            wbs)
        t = rgb.shape[0]
        out_ref[:] = jnp.concatenate(
            [rgb[:, :s.rgb_channels], alpha[:, :s.alpha_channels],
             jnp.zeros((t, OUT_PAD - s.rgb_channels - s.alpha_channels),
                       jnp.float32)], axis=-1)
        rawt_ref[:] = jnp.concatenate(
            [raw_t, jnp.zeros((t, fm.RAW_PAD - raw_t.shape[1]),
                              jnp.float32)], axis=-1)
    return kernel


def _make_bwd_kernel(spec: FusedLevelSpec, has_ac: bool):
    s = spec

    def kernel(*refs):
        x_ref, rgbc_ref = refs[0], refs[1]
        off = 2
        alphac_ref = refs[off] if has_ac else None
        off += 1 if has_ac else 0
        g_ref = refs[off]; off += 1
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(s.n_layers)]
        o = off + 2 * s.n_layers
        dx_ref = refs[o]
        drgbc_ref = refs[o + 1]
        o += 2
        dalphac_ref = refs[o] if has_ac else None
        o += 1 if has_ac else 0
        dwb_refs = refs[o:o + 2 * s.n_layers]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in dwb_refs:
                r[:] = jnp.zeros(r.shape, r.dtype)

        x_raw = x_ref[:]
        rgbc = rgbc_ref[:]
        alphac = alphac_ref[:] if has_ac else None
        warp_wbs, hyper_wbs, tmpl_wbs = _split_wbs(s, wbs)

        # Recompute the chain up to the template input (field stashes are
        # reused by their backward passes below — no duplicate recompute).
        pts = x_raw[:, :3].astype(jnp.float32)
        raw_f = x_raw[:, :3 + s.embed_ch]
        warp_vals = ff._forward_tile(s.warp_fs, raw_f, warp_wbs)
        warped = pts + warp_vals[-1][:, :3]
        hyper_vals = ff._forward_tile(s.hyper_fs, raw_f, hyper_wbs)
        hyper = hyper_vals[-1][:, :s.hyper_out]
        raw_t = jnp.concatenate([warped, hyper], axis=-1)
        t = x_raw.shape[0]

        # Template backward (includes its posenc VJP): dx_t is (T, 3+H).
        dx_t, drgbc, dalphac, t_grads = fm._backward_tile(
            s.tmpl_fs, raw_t, rgbc, alphac, g_ref[:], tmpl_wbs)
        d_warped = dx_t[:, :3]
        d_hyper = dx_t[:, 3:]

        # Hyper-sheet backward.
        g_h = jnp.concatenate(
            [d_hyper, jnp.zeros((t, ff.OUT_PAD - s.hyper_out), jnp.float32)],
            axis=-1)
        d_rawf_h, h_grads = ff._backward_tile(s.hyper_fs, raw_f, g_h,
                                              hyper_wbs, fwd_vals=hyper_vals)

        # Warp-field backward (delta head; the residual adds d_warped to
        # d_points directly).
        g_w = jnp.concatenate(
            [d_warped, jnp.zeros((t, ff.OUT_PAD - 3), jnp.float32)], axis=-1)
        d_rawf_w, w_grads = ff._backward_tile(s.warp_fs, raw_f, g_w, warp_wbs,
                                              fwd_vals=warp_vals)

        d_pts = d_warped + d_rawf_w[:, :3] + d_rawf_h[:, :3]
        d_emb = d_rawf_w[:, 3:] + d_rawf_h[:, 3:]
        d_raw = jnp.concatenate(
            [d_pts, d_emb,
             jnp.zeros((t, RAW_PAD - 3 - s.embed_ch), jnp.float32)], axis=-1)
        dx_ref[:] = d_raw.astype(dx_ref.dtype)
        drgbc_ref[:] = drgbc.astype(drgbc_ref.dtype)
        if has_ac:
            dalphac_ref[:] = dalphac.astype(dalphac_ref.dtype)

        for k, (dw, db) in enumerate(w_grads + h_grads + t_grads):
            dwb_refs[2 * k][:] += dw
            dwb_refs[2 * k + 1][:] += db
    return kernel


def _pad_all_params(spec: FusedLevelSpec, warp_pairs, hyper_pairs,
                    tmpl_pairs):
    return (ff._pad_params(spec.warp_fs, warp_pairs)
            + ff._pad_params(spec.hyper_fs, hyper_pairs)
            + fm._pad_params(spec.tmpl_fs, tmpl_pairs))


def _data_specs(spec, widths):
    return [pl.BlockSpec((spec.tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for w in widths]


def _weight_specs(padded_wbs):
    w_in, w_specs = [], []
    for w, b in padded_wbs:
        w_in += [w, b]
        w_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    return w_in, w_specs




def _make_fields_bwd_kernel(spec: FusedLevelSpec):
    """Backward through warp field + hyper sheet given d(warped|hyper)."""
    s = spec
    n_field_layers = s.n_warp_layers + s.n_hyper_layers

    def kernel(*refs):
        x_ref = refs[0]
        dxt_ref = refs[1]
        wbs = [(refs[2 + 2 * k][:], refs[2 + 2 * k + 1][:])
               for k in range(n_field_layers)]
        o = 2 + 2 * n_field_layers
        dx_ref = refs[o]
        dwb_refs = refs[o + 1:o + 1 + 2 * n_field_layers]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in dwb_refs:
                r[:] = jnp.zeros(r.shape, r.dtype)

        x_raw = x_ref[:]
        raw_f = x_raw[:, :3 + s.embed_ch]
        t = x_raw.shape[0]
        warp_wbs = wbs[:s.n_warp_layers]
        hyper_wbs = wbs[s.n_warp_layers:]

        dx_t = dxt_ref[:]
        d_warped = dx_t[:, :3]
        d_hyper = dx_t[:, 3:3 + s.hyper_out]

        g_h = jnp.concatenate(
            [d_hyper, jnp.zeros((t, ff.OUT_PAD - s.hyper_out), jnp.float32)],
            axis=-1)
        d_rawf_h, h_grads = ff._backward_tile(s.hyper_fs, raw_f, g_h,
                                              hyper_wbs)
        g_w = jnp.concatenate(
            [d_warped, jnp.zeros((t, ff.OUT_PAD - 3), jnp.float32)], axis=-1)
        d_rawf_w, w_grads = ff._backward_tile(s.warp_fs, raw_f, g_w, warp_wbs)

        d_pts = d_warped + d_rawf_w[:, :3] + d_rawf_h[:, :3]
        d_emb = d_rawf_w[:, 3:] + d_rawf_h[:, 3:]
        d_raw = jnp.concatenate(
            [d_pts, d_emb,
             jnp.zeros((t, RAW_PAD - 3 - s.embed_ch), jnp.float32)], axis=-1)
        dx_ref[:] = d_raw.astype(dx_ref.dtype)
        for k, (dw, db) in enumerate(w_grads + h_grads):
            dwb_refs[2 * k][:] += dw
            dwb_refs[2 * k + 1][:] += db
    return kernel


def _fields_bwd_call(spec: FusedLevelSpec, x_raw, dx_t, field_padded_wbs):
    s = spec._replace(tile=spec.bwd_tile or spec.tile)
    p = x_raw.shape[0]
    w_in, w_specs = _weight_specs(field_padded_wbs)
    in_specs = _data_specs(s, [x_raw.shape[1], fm.RAW_PAD]) + w_specs
    out_shapes = [jax.ShapeDtypeStruct((p, x_raw.shape[1]), jnp.float32)]
    out_specs = _data_specs(s, [x_raw.shape[1]])
    for w, b in field_padded_wbs:
        out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                       jax.ShapeDtypeStruct(b.shape, jnp.float32)]
        out_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    return pl.pallas_call(
        _make_fields_bwd_kernel(s),
        grid=(p // s.tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=s.interpret,
    )(x_raw, dx_t, *w_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(spec, x_raw, rgbc, alphac, padded_flat):
    s = spec
    p = x_raw.shape[0]
    has_ac = alphac is not None
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    widths = [x_raw.shape[1], rgbc.shape[1]] + (
        [alphac.shape[1]] if has_ac else [])
    data_in = [x_raw, rgbc] + ([alphac] if has_ac else [])
    w_in, w_specs = _weight_specs(padded_wbs)
    return pl.pallas_call(
        _make_fwd_kernel(s, has_ac),
        grid=(p // s.tile,),
        in_specs=_data_specs(s, widths) + w_specs,
        out_specs=[
            pl.BlockSpec((s.tile, OUT_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s.tile, fm.RAW_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((p, OUT_PAD), jnp.float32),
                   jax.ShapeDtypeStruct((p, fm.RAW_PAD), jnp.float32)],
        interpret=s.interpret,
    )(*data_in, *w_in)


def _fused_fwd(spec, x_raw, rgbc, alphac, padded_flat):
    out, raw_t = _fused(spec, x_raw, rgbc, alphac, padded_flat)
    return (out, raw_t), (x_raw, rgbc, alphac, padded_flat, raw_t)


def _fused_bwd(spec, res, g):
    x_raw, rgbc, alphac, padded_flat, raw_t = res
    # raw_t is an internal residual output; its cotangent (g[1]) is always
    # zero because fused_level never exposes it.
    g = g[0]
    if spec.split_bwd:
        return _fused_bwd_split(spec, x_raw, rgbc, alphac, padded_flat,
                                raw_t, g)
    s = spec._replace(tile=spec.bwd_tile or spec.tile)
    p = x_raw.shape[0]
    has_ac = alphac is not None
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    widths = [x_raw.shape[1], rgbc.shape[1]] + (
        [alphac.shape[1]] if has_ac else [])
    data_in = [x_raw, rgbc] + ([alphac] if has_ac else []) + [g]
    w_in, w_specs = _weight_specs(padded_wbs)
    g_spec = pl.BlockSpec((s.tile, OUT_PAD), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((p, x_raw.shape[1]), jnp.float32),
                  jax.ShapeDtypeStruct((p, rgbc.shape[1]), jnp.float32)]
    out_specs = _data_specs(s, [x_raw.shape[1], rgbc.shape[1]])
    if has_ac:
        out_shapes.append(
            jax.ShapeDtypeStruct((p, alphac.shape[1]), jnp.float32))
        out_specs += _data_specs(s, [alphac.shape[1]])
    for w, b in padded_wbs:
        out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                       jax.ShapeDtypeStruct(b.shape, jnp.float32)]
        out_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        _make_bwd_kernel(s, has_ac),
        grid=(p // s.tile,),
        in_specs=_data_specs(s, widths) + [g_spec] + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=s.interpret,
    )(*data_in, *w_in)
    dx = outs[0].astype(x_raw.dtype)
    drgbc = outs[1].astype(rgbc.dtype)
    o = 2
    dalphac = outs[o].astype(alphac.dtype) if has_ac else None
    o += 1 if has_ac else 0
    dflat = tuple(outs[o + k].astype(padded_flat[k].dtype)
                  for k in range(len(padded_flat)))
    return dx, drgbc, dalphac, dflat



def _fused_bwd_split(spec, x_raw, rgbc, alphac, padded_flat, raw_t, g):
    """Two-kernel backward: template bwd (fused_mlp's, larger tile) then a
    lean fields bwd, stitched through dx_t = d(warped|hyper)."""
    s = spec
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    nw, nh = s.n_warp_layers, s.n_hyper_layers
    field_wbs = padded_wbs[:nw + nh]
    tmpl_wbs = padded_wbs[nw + nh:]

    outs_t = fm._bwd_call(s.tmpl_fs, raw_t, rgbc, alphac, tmpl_wbs, g)
    has_ac = alphac is not None
    dx_t = outs_t[0]            # (P, fm.RAW_PAD) fp32
    drgbc = outs_t[1].astype(rgbc.dtype)
    o = 2
    dalphac = outs_t[o].astype(alphac.dtype) if has_ac else None
    o += 1 if has_ac else 0
    tmpl_dflat = list(outs_t[o:])

    outs_f = _fields_bwd_call(s, x_raw, dx_t, field_wbs)
    dx = outs_f[0].astype(x_raw.dtype)
    field_dflat = list(outs_f[1:])

    dflat_all = field_dflat + tmpl_dflat
    dflat = tuple(dflat_all[k].astype(padded_flat[k].dtype)
                  for k in range(len(padded_flat)))
    return dx, drgbc, dalphac, dflat


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_level(spec: FusedLevelSpec, points, embed, rgb_cond, alpha_cond,
                warp_pairs, hyper_pairs, tmpl_pairs):
    """Evaluate the full fused level.

    Args:
      spec: static FusedLevelSpec.
      points: (P, 3) sample positions.
      embed: (P, embed_ch) per-sample warp/hyper embedding (shared — the
        share_GLO default; models.py:167).
      rgb_cond: (P, rgb_cond_ch); alpha_cond: (P, alpha_cond_ch) or None.
      warp_pairs / hyper_pairs: (W, b) lists in MLP order.
      tmpl_pairs: (W, b) list in NerfMLP order.

    Returns:
      {'rgb': (P, 3) raw logits, 'alpha': (P, 1) raw density} fp32.
    """
    s = spec
    assert 3 + s.embed_ch <= RAW_PAD, 'embed too wide for RAW_PAD'
    import math as _math
    p = points.shape[0]
    granularity = _math.lcm(s.tile, s.bwd_tile or s.tile,
                            s.tmpl_bwd_tile if s.split_bwd else 1)
    p_pad = _rup(p, granularity)

    def pad_rows(a):
        return jnp.pad(a, ((0, p_pad - p), (0, 0))) if p_pad != p else a

    dt = jnp.dtype(s.compute_dtype)
    x_raw = pad_rows(jnp.concatenate(
        [points.astype(jnp.float32), embed.astype(jnp.float32),
         jnp.zeros((p, RAW_PAD - 3 - s.embed_ch), jnp.float32)], axis=-1))
    rgbc = pad_rows(jnp.pad(rgb_cond.astype(dt),
                            ((0, 0), (0, s.tmpl_fs.rc - s.rgb_cond_ch))))
    if s.alpha_cond_ch:
        alphac = pad_rows(jnp.pad(
            alpha_cond.astype(dt),
            ((0, 0), (0, s.tmpl_fs.ac - s.alpha_cond_ch))))
    else:
        alphac = None

    padded = _pad_all_params(s, warp_pairs, hyper_pairs, tmpl_pairs)
    padded_flat = tuple(a for wb in padded for a in wb)
    out, _raw_t = _fused(s, x_raw, rgbc, alphac, padded_flat)
    out = out[:p]
    return {'rgb': out[:, :s.rgb_channels],
            'alpha': out[:, s.rgb_channels:s.rgb_channels
                         + s.alpha_channels]}
