"""Fully fused HyperNeRF level: warp field + hyper sheet + template, ONE kernel.

The flagship configuration (translation warp + bendy-sheet slicing +
original-NeRF encodings, models.py render path) evaluates three MLPs per
sample. Running them as separate kernels leaves HBM round-trips and
serialization barriers between them; here the whole per-sample pipeline

    [points | warp embed] -> warp MLP -> warped = points + delta
                          -> hyper-sheet MLP -> hyper coords
    [warped | hyper] -> posenc -> template MLP -> (rgb, alpha)

runs inside one Pallas kernel per tile. ``slice_method='axis_aligned_plane'``
covers the reference's other hyper slicing (models.py:514-543): the hyper
coords are the embed itself, so the hyper MLP drops out and d_hyper routes
straight into the per-ray embed gradient. The backward is one kernel too:
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

from hypernerf_tpu.ops.pallas.common import vmem_params

from hypernerf_tpu.ops.pallas import fused_field as ff
from hypernerf_tpu.ops.pallas import fused_mlp as fm
from hypernerf_tpu.ops.pallas import fused_se3 as fs3

RAW_PAD = 16  # [points(3) | embed(E<=13)] padded lanes (per-point embed mode)
OD_PAD = 16   # per-ray [origin(3) | 0 | direction(3) | 0] lanes (ray mode)
OUT_PAD = 8


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedLevelSpec(NamedTuple):
    """Static config of the fused level (hashable)."""
    embed_ch: int = 8
    # warp field: 'translation' (posenc_orig ++ embed -> MLP -> points+delta),
    # 'se3' (Nerfies posenc [++ embed] -> trunk -> w/v heads -> in-kernel
    # screw exponential, rigid_body.se3_warp_vec), or 'quaternion' (same
    # trunk/heads, quaternion-exp rotation + uncoupled translation,
    # quaternion.quat_warp_vec).
    warp_type: str = 'translation'
    warp_depth: int = 6
    warp_width: int = 128
    warp_freq: int = 10
    se3_min_deg: int = 0
    se3_max_deg: int = 8
    se3_use_metadata: bool = True
    # warp_alpha annealing window for the SE(3) encoding (scale-row input).
    warp_windowed: bool = False
    # hyper slicing: 'bendy_sheet' (posenc_orig ++ embed -> hyper MLP ->
    # hyper coords, models.py:514-543) or 'axis_aligned_plane' (the hyper
    # coords ARE the embed — no hyper MLP; hyper_out must equal embed_ch
    # and the embed gradient receives d_hyper directly).
    slice_method: str = 'bendy_sheet'
    # hyper sheet (bendy_sheet only)
    hyper_depth: int = 6
    hyper_width: int = 64
    hyper_sheet_freq: int = 7
    hyper_out: int = 4
    # template encoding: posenc_orig (use_original_embed) with
    # xyz_freq/hyper_freq bands, or the Nerfies windowed posenc over
    # [spatial|hyper]_[min|max]_deg with identity only on the spatial
    # segment (models.py:457-478 vs the anneal mode). The Nerfies mode takes
    # a (1, in_pad) window-scale row built from the annealing alphas.
    use_original_embed: bool = True
    xyz_freq: int = 10
    hyper_freq: int = 6
    spatial_min_deg: int = 0
    spatial_max_deg: int = 10
    hyper_min_deg: int = 0
    hyper_max_deg: int = 4
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
    # 1024 needs ~19M scoped VMEM — above Mosaic's 16M default, admitted by
    # the raised limit in common.py. Measured on TPU: 512 -> 1024 lifts the
    # flagship 65.2k -> 66.4k rays/s.
    tmpl_bwd_tile: int = 1024
    # When >0, rgb/alpha conditions are PER-RAY rows (P // cond_samples),
    # expanded in-kernel; see fused_mlp.FusedMLPSpec.cond_samples.
    cond_samples: int = 0
    # Software-pipelined backward: ONE kernel whose grid step i runs the
    # template backward of tile i INTERLEAVED (common.interleave) with the
    # fields backward of tile i-1, stitched through a VMEM scratch carrying
    # dx_t = d(warped|hyper). Mosaic overlaps the alternating independent
    # instruction streams, hiding the lane-starved fields work (narrow
    # 128/64-wide chains, retraction VPU math, encode VJP) under the fat
    # 256-wide template matmuls. Both stages share ``bwd_tile``;
    # tmpl_bwd_tile is unused. Takes precedence over split_bwd.
    pipelined_bwd: bool = False
    # Same pipelining for the forward: fields fwd of tile i interleaved
    # with the template fwd of tile i-1, raw_t carried in VMEM scratch.
    pipelined_fwd: bool = False
    # Half-tile interleaved forward: each grid step splits its tile into
    # two independent halves and alternates their WHOLE level streams
    # (fields + template) op-group by op-group. Unlike pipelined_fwd
    # (which pairs the small fields stream with the big template stream —
    # measured ~neutral, BENCHMARKS.md round 4), the two streams here are
    # symmetric: while half A sits in a matmul's f32 epilogue (VPU), half
    # B's next matmul issues on the MXU. Row-blocked matmuls are
    # bit-identical to the full-tile forward. Ignored when pipelined_fwd
    # is set.
    interleaved_fwd: bool = False
    # Hidden-layer epilogues (bias+relu) in the compute dtype instead of
    # fp32 across all three sub-kernels (see fused_mlp.FusedMLPSpec).
    bf16_epilogue: bool = False

    @property
    def warp_fs(self):
        if self.warp_type in ('se3', 'quaternion'):
            return fs3.FusedSE3Spec(
                embed_ch=self.embed_ch, use_metadata=self.se3_use_metadata,
                min_deg=self.se3_min_deg, max_deg=self.se3_max_deg,
                depth=self.warp_depth, width=self.warp_width,
                skips=self.skips, compute_dtype=self.compute_dtype,
                windowed=self.warp_windowed,
                bf16_epilogue=self.bf16_epilogue)
        return ff.FusedFieldSpec(
            segments=((3, self.warp_freq), (self.embed_ch, 0)),
            depth=self.warp_depth, width=self.warp_width, out_ch=3,
            skips=self.skips, compute_dtype=self.compute_dtype,
            bf16_epilogue=self.bf16_epilogue)

    @property
    def hyper_fs(self) -> 'ff.FusedFieldSpec':
        return ff.FusedFieldSpec(
            segments=((3, self.hyper_sheet_freq), (self.embed_ch, 0)),
            depth=self.hyper_depth, width=self.hyper_width,
            out_ch=self.hyper_out, skips=self.skips,
            compute_dtype=self.compute_dtype,
            bf16_epilogue=self.bf16_epilogue)

    @property
    def tmpl_enc_segments(self) -> tuple:
        if self.use_original_embed:
            return ((3, self.xyz_freq), (self.hyper_out, self.hyper_freq))
        return ((3, self.spatial_max_deg - self.spatial_min_deg,
                 self.spatial_min_deg, True),
                (self.hyper_out, self.hyper_max_deg - self.hyper_min_deg,
                 self.hyper_min_deg, False))

    @property
    def tmpl_fs(self) -> 'fm.FusedMLPSpec':
        in_ch = sum(ff.seg_enc_ch(seg) for seg in self.tmpl_enc_segments)
        return fm.FusedMLPSpec(
            in_ch=in_ch, trunk_depth=self.trunk_depth,
            trunk_width=self.trunk_width, rgb_depth=self.rgb_depth,
            rgb_width=self.rgb_width, rgb_channels=self.rgb_channels,
            alpha_channels=self.alpha_channels, skips=self.skips,
            rgb_cond_ch=self.rgb_cond_ch, alpha_cond_ch=self.alpha_cond_ch,
            compute_dtype=self.compute_dtype,
            tile=self.tmpl_bwd_tile, bwd_tile=self.tmpl_bwd_tile,
            interpret=self.interpret,
            enc_segments=self.tmpl_enc_segments,
            windowed=not self.use_original_embed,
            cond_samples=self.cond_samples,
            bf16_epilogue=self.bf16_epilogue)

    @property
    def emb_pad(self):
        """Lane padding of the per-ray embed input (cond_samples mode)."""
        return _rup(self.embed_ch, 8)

    @property
    def tmpl_raw_pad(self):
        """Lane padding of the template's raw [warped|hyper] residual."""
        return fm.raw_pad_for(3 + self.hyper_out)

    @property
    def n_warp_layers(self):
        # translation: hidden + logit; se3/quaternion: hidden + trunk
        # logit + w + v.
        return self.warp_depth + (3 if self.warp_type in ('se3', 'quaternion')
                                  else 1)

    @property
    def n_hyper_layers(self):
        if self.slice_method != 'bendy_sheet':
            return 0
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


def _assemble_raw(spec: FusedLevelSpec, x_ref, od_ref, emb_ref):
    """Build the per-point (T, 3+E) raw value from the kernel inputs.

    Per-point mode: x_ref is (T, RAW_PAD) [pts|embed|0]; od_ref unused.
    Ray mode (cond_samples>0): x_ref is (T, 1) z values, od_ref a
    (1, rays, OD_PAD) per-ray [origin|direction] block, emb_ref a
    (1, rays, emb_pad) per-ray embed block. The sample position
    o + z*d is computed right here in VMEM (the XLA version materializes
    (B, S, 3) broadcasts of o and d plus the (P, 3) points in HBM).

    Returns (raw (T, 3+E), d_exp (T, OD_PAD) or None) — d_exp is reused by
    the backward for d_z / d_od.
    """
    x = x_ref[:]
    if not spec.cond_samples:
        return x, None
    od = fm._expand_rays(od_ref[0], x.shape[0])   # (T, OD_PAD) f32
    pts = od[:, :3] + x * od[:, 8:11]
    emb = fm._expand_rays(emb_ref[0], x.shape[0])
    return jnp.concatenate([pts, emb[:, :spec.embed_ch]], axis=-1), od


def _write_ray_grads(spec, x_ref, od_exp, d_pts, d_emb,
                     dz_ref, dod_ref, demb_ref):
    """Ray-mode gradient writes: d_z per point, d[o|d] and d_emb per ray.

    pts = o + z*d, so d_z = sum_c d_pts_c * d_c, d_o = sum_s d_pts,
    d_d = sum_s z * d_pts — the per-ray sums ride the one-hot matmul.
    """
    s = spec
    t = d_pts.shape[0]
    z = x_ref[:]                                   # (T, 1)
    dz_ref[:] = jnp.sum(d_pts * od_exp[:, 8:11], axis=1,
                        keepdims=True).astype(dz_ref.dtype)
    d_od = jnp.concatenate(
        [d_pts, jnp.zeros((t, 5), jnp.float32),
         d_pts * z, jnp.zeros((t, OD_PAD - 11), jnp.float32)], axis=-1)
    dod_ref[0] = fm._reduce_rays(d_od, dod_ref.shape[1]).astype(
        dod_ref.dtype)
    demb = fm._reduce_rays(d_emb, demb_ref.shape[1])
    demb_ref[0] = jnp.pad(
        demb, ((0, 0), (0, s.emb_pad - s.embed_ch))).astype(demb_ref.dtype)


def _wv_retraction(spec: FusedLevelSpec):
    """The (w, v, points) -> warped retraction for trunk-head warp types.

    Pure jnp vector forms (traceable and vjp-able inside the kernels):
    screw exponential for 'se3', quaternion-exp rotation + translation for
    'quaternion'.
    """
    if spec.warp_type == 'quaternion':
        from hypernerf_tpu.ops import quaternion
        return quaternion.quat_warp_vec
    from hypernerf_tpu.ops import rigid_body
    return rigid_body.se3_warp_vec


def _wv_retraction_bwd(spec: FusedLevelSpec):
    """Hand-derived VJP of the retraction: (w, v, pts, g) -> (dw, dv, dpts).

    Replaces in-kernel ``jax.vjp`` over the retraction: the AD residuals
    (~20 lane-padded (T, 3) arrays) stayed live across the whole trunk
    backward and pinned the SE(3)/quaternion fields-backward tile to 256.
    The closed forms recompute sin/cos/cross terms inline — a handful of
    VPU ops with a minimal live set — and are pinned against jax.vjp at
    1e-12 (tests/test_rigid_body.py, tests/test_quaternion.py).
    """
    if spec.warp_type == 'quaternion':
        from hypernerf_tpu.ops import quaternion
        return quaternion.quat_warp_vec_bwd
    from hypernerf_tpu.ops import rigid_body
    return rigid_body.se3_warp_vec_bwd


def _to_cm(m, rows: int = 3):
    """(T, c) row-major -> (rows, T) component-major via a lane-padded
    transpose.

    Inside Mosaic, (T, 3)/(T, 1) retraction math runs at 3/128 lane
    utilization; transposed to (3, T) it uses full lanes (measured 2.7x fwd
    / 4.8x bwd on the screw exponential). The transpose itself is cheap at
    8-lane-multiple widths.
    """
    c = m.shape[1]
    pad = (-c) % 8
    if pad:
        m = jnp.concatenate(
            [m, jnp.zeros((m.shape[0], pad), m.dtype)], axis=-1)
    return m.T[:rows]


def _from_cm(m):
    """(rows<=8, T) component-major -> (T, rows) row-major."""
    rows = m.shape[0]
    pad = (-rows) % 8
    if pad:
        m = jnp.concatenate([m, jnp.zeros((pad, m.shape[1]), m.dtype)],
                            axis=0)
    return m.T[:, :rows]


def _warp_fwd_tile_gen(spec: FusedLevelSpec, pts, raw_f, warp_wbs,
                       warp_scales=None):
    """Generator form of _warp_fwd_tile (yields at op-group boundaries)."""
    s = spec
    if s.warp_type in ('se3', 'quaternion'):
        vals = yield from fs3._forward_tile_gen(s.warp_fs, raw_f, warp_wbs,
                                                scales=warp_scales)
        w_out, v_out = vals[-2], vals[-1]
        retract = _wv_retraction(s)
        warped_cm = retract(_to_cm(w_out), _to_cm(v_out), _to_cm(pts),
                            axis=0)
        yield
        return _from_cm(warped_cm), vals
    vals = yield from ff._forward_tile_gen(s.warp_fs, raw_f, warp_wbs)
    return pts + vals[-1][:, :3], vals


def _warp_fwd_tile(spec: FusedLevelSpec, pts, raw_f, warp_wbs,
                   warp_scales=None):
    """(warped points, fwd stash) for one tile (translation, SE(3), or
    quaternion)."""
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_warp_fwd_tile_gen(spec, pts, raw_f, warp_wbs,
                                    warp_scales))


def _warp_tile(spec: FusedLevelSpec, pts, raw_f, warp_wbs,
               warp_scales=None):
    return _warp_fwd_tile(spec, pts, raw_f, warp_wbs, warp_scales)[0]


def _hyper_trig_from_warp(spec: FusedLevelSpec, warp_vals):
    """Slice the warp encoding's lower bands for the hyper sheet.

    Both fields encode the SAME raw points, and the band-matrix layout
    groups columns by band, so the hyper sheet's 2^0..2^(F_h-1) sin/cos
    are the leading 3*F_h columns of the warp field's — whenever the warp
    encoding covers them (translation: warp_freq >= hyper_sheet_freq;
    se3/quaternion: min_deg == 0 and enough degrees). Returns the
    per-segment trig list for hyper_fs, or None when not shareable.
    Bit-identical: the shared columns are the same K=3 band products.
    """
    s = spec
    fh = s.hyper_sheet_freq
    if s.warp_type in ('se3', 'quaternion'):
        if s.se3_min_deg != 0 or s.warp_fs.n_freq < fh:
            return None
        sin_w, cos_w = warp_vals[1]
    else:
        if s.warp_freq < fh:
            return None
        sin_w, cos_w = warp_vals[1][0]
    return [(sin_w[:, :3 * fh], cos_w[:, :3 * fh]), None]


def _fields_fwd_core_gen(spec: FusedLevelSpec, x_raw, warp_wbs, hyper_wbs,
                         warp_scales=None):
    """Fields half of the level forward on one tile, as a generator.

    Returns raw_t = (T, 3 + hyper_out) [warped | hyper] fp32 — the template
    stage's raw input.
    """
    s = spec
    pts = x_raw[:, :3].astype(jnp.float32)
    raw_f = x_raw[:, :3 + s.embed_ch]
    warped, warp_vals = yield from _warp_fwd_tile_gen(s, pts, raw_f,
                                                      warp_wbs, warp_scales)
    if s.slice_method == 'bendy_sheet':
        *_, hyper_out = yield from ff._forward_tile_gen(
            s.hyper_fs, raw_f, hyper_wbs,
            trig=_hyper_trig_from_warp(s, warp_vals))
        hyper = hyper_out[:, :s.hyper_out]
    else:
        # axis_aligned_plane: the hyper coords ARE the embed
        # (models.py:514-543 map_hyper_points).
        hyper = raw_f[:, 3:3 + s.embed_ch].astype(jnp.float32)
    return jnp.concatenate([warped, hyper], axis=-1)


def _fields_bwd_core_gen(spec: FusedLevelSpec, x_raw, dx_t, warp_wbs,
                         hyper_wbs, warp_scales=None):
    """Fields half of the level backward on one tile, as a generator.

    dx_t: (T, >=3+hyper_out) cotangent of [warped | hyper] from the template
    backward. Returns (d_pts, d_emb, grads) with grads = warp + hyper
    (dW, db) pairs in kernel order. Linear in dx_t: a zero cotangent yields
    exactly-zero gradients (the pipelined kernel's masked first step relies
    on this).
    """
    s = spec
    t = x_raw.shape[0]
    pts = x_raw[:, :3].astype(jnp.float32)
    raw_f = x_raw[:, :3 + s.embed_ch]
    d_warped = dx_t[:, :3]
    d_hyper = dx_t[:, 3:3 + s.hyper_out]

    # Run the warp forward first so the hyper backward's recompute can
    # slice its band trig (and the warp backward reuses the fwd_vals).
    _, warp_vals = yield from _warp_fwd_tile_gen(s, pts, raw_f, warp_wbs,
                                                 warp_scales)
    if s.slice_method == 'bendy_sheet':
        g_h = jnp.concatenate(
            [d_hyper,
             jnp.zeros((t, ff.OUT_PAD - s.hyper_out), jnp.float32)],
            axis=-1)
        d_rawf_h, h_grads = yield from ff._backward_tile_gen(
            s.hyper_fs, raw_f, g_h, hyper_wbs,
            trig=_hyper_trig_from_warp(s, warp_vals))
    else:
        d_rawf_h, h_grads = None, []
    d_pts_w, d_emb_w, w_grads = yield from _warp_bwd_tile_gen(
        s, pts, raw_f, warp_wbs, d_warped, warp_scales, fwd_vals=warp_vals)

    if s.slice_method == 'bendy_sheet':
        d_pts = d_pts_w + d_rawf_h[:, :3]
        d_emb = d_emb_w + d_rawf_h[:, 3:]
    else:
        # Plane slicing: d_hyper IS the embed gradient.
        d_pts = d_pts_w
        d_emb = d_emb_w + d_hyper
    return d_pts, d_emb, w_grads + h_grads


def _level_fwd_gen(spec: FusedLevelSpec, x_raw, rgbc, alphac, warp_wbs,
                   hyper_wbs, tmpl_wbs, warp_scales, tmpl_scales):
    """The whole level forward (fields + template) on one row block, as a
    generator yielding at op-group boundaries (see common.interleave)."""
    raw_t = yield from _fields_fwd_core_gen(spec, x_raw, warp_wbs, hyper_wbs,
                                            warp_scales)
    rgb, alpha, _ = yield from fm._forward_tile_gen(
        spec.tmpl_fs, raw_t, rgbc, alphac, tmpl_wbs, enc_scales=tmpl_scales)
    return rgb, alpha, raw_t


def _forward_values(spec: FusedLevelSpec, x_raw, rgbc, alphac, wbs,
                    warp_scales=None, tmpl_scales=None):
    """The fused chain on one tile; returns (rgb, alpha) raw fp32 heads."""
    from hypernerf_tpu.ops.pallas.common import drive, interleave
    s = spec
    warp_wbs, hyper_wbs, tmpl_wbs = _split_wbs(s, wbs)
    if s.interleaved_fwd:
        # Two independent half-tile streams alternated in program order:
        # each half's dependent matmul->f32-epilogue chain fills the
        # other's MXU idle slots. Row-blocked matmuls make the halves'
        # concatenation bit-identical to the sequential full tile.
        t = x_raw.shape[0]
        h = t // 2
        # Mosaic sublane slices need 8-row alignment for BOTH halves, i.e.
        # t % 16 == 0 (an odd t would start the second half mid-sublane even
        # when h % 8 == 0); the interpreter (CPU tests at tiny tiles) has no
        # such constraint. Raise, don't assert: -O must not skip this.
        if not s.interpret and t % 16 != 0:
            raise ValueError(
                f'interleaved_fwd needs 16-row-aligned tiles, got {t}')

        def half(lo, hi):
            return _level_fwd_gen(
                s, x_raw[lo:hi], rgbc[lo:hi],
                None if alphac is None else alphac[lo:hi],
                warp_wbs, hyper_wbs, tmpl_wbs, warp_scales, tmpl_scales)

        res_a, res_b = interleave(half(0, h), half(h, t))
        rgb = jnp.concatenate([res_a[0], res_b[0]], axis=0)
        alpha = jnp.concatenate([res_a[1], res_b[1]], axis=0)
        raw_t = jnp.concatenate([res_a[2], res_b[2]], axis=0)
        return rgb, alpha, raw_t
    raw_t = drive(_fields_fwd_core_gen(s, x_raw, warp_wbs, hyper_wbs,
                                       warp_scales))
    rgb, alpha, _ = fm._forward_tile(s.tmpl_fs, raw_t, rgbc, alphac, tmpl_wbs,
                                     enc_scales=tmpl_scales)
    return rgb, alpha, raw_t


def _make_fwd_kernel(spec: FusedLevelSpec, has_ac: bool):
    s = spec

    def kernel(*refs):
        x_ref = refs[0]
        off = 1
        od_ref = refs[off] if s.cond_samples else None
        off += 1 if s.cond_samples else 0
        emb_ref = refs[off] if s.cond_samples else None
        off += 1 if s.cond_samples else 0
        rgbc_ref = refs[off]; off += 1
        alphac_ref = refs[off] if has_ac else None
        off += 1 if has_ac else 0
        warp_scales = refs[off][:] if s.warp_windowed else None
        off += 1 if s.warp_windowed else 0
        tmpl_scales = refs[off][:] if not s.use_original_embed else None
        off += 0 if s.use_original_embed else 1
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(s.n_layers)]
        out_ref = refs[off + 2 * s.n_layers]
        rawt_ref = refs[off + 2 * s.n_layers + 1]
        x_raw, _ = _assemble_raw(s, x_ref, od_ref, emb_ref)
        if s.cond_samples:
            rgbc = fm._expand_rays(rgbc_ref[0], x_raw.shape[0])
            alphac = (fm._expand_rays(alphac_ref[0], x_raw.shape[0])
                      if has_ac else None)
        else:
            rgbc = rgbc_ref[:]
            alphac = alphac_ref[:] if has_ac else None
        rgb, alpha, raw_t = _forward_values(s, x_raw, rgbc, alphac,
                                            wbs, warp_scales, tmpl_scales)
        t = rgb.shape[0]
        out_ref[:] = jnp.concatenate(
            [rgb[:, :s.rgb_channels], alpha[:, :s.alpha_channels],
             jnp.zeros((t, OUT_PAD - s.rgb_channels - s.alpha_channels),
                       jnp.float32)], axis=-1)
        rawt_ref[:] = jnp.concatenate(
            [raw_t, jnp.zeros((t, s.tmpl_raw_pad - raw_t.shape[1]),
                              jnp.float32)], axis=-1)
    return kernel


def _warp_bwd_tile_gen(spec: FusedLevelSpec, pts, raw_f, warp_wbs, d_warped,
                       warp_scales=None, fwd_vals=None):
    """Generator form of _warp_bwd_tile (yields at op-group boundaries)."""
    s = spec
    t = pts.shape[0]
    if s.warp_type in ('se3', 'quaternion'):
        if fwd_vals is not None:
            vals = fwd_vals
        else:
            vals = yield from fs3._forward_tile_gen(
                s.warp_fs, raw_f, warp_wbs, scales=warp_scales)
        # Component-major (3, T) retraction backward: full-lane VPU (see
        # _to_cm); the (T, OUT_PAD) g_wv comes back via one transpose.
        d_w3, d_v3, d_pts_cm = _wv_retraction_bwd(s)(
            _to_cm(vals[-2]), _to_cm(vals[-1]), _to_cm(pts),
            _to_cm(d_warped), axis=0)
        yield
        d_pts_direct = _from_cm(d_pts_cm)
        g_wv = _from_cm(jnp.concatenate(
            [d_w3, d_v3,
             jnp.zeros((fs3.OUT_PAD - 6, t), jnp.float32)], axis=0))
        d_rawf, w_grads = yield from fs3._backward_tile_gen(
            s.warp_fs, raw_f, g_wv, warp_wbs, scales=warp_scales,
            fwd_vals=vals)
        if s.se3_use_metadata:
            d_emb = d_rawf[:, 3:3 + s.embed_ch]
        else:
            d_emb = jnp.zeros((t, s.embed_ch), jnp.float32)
        return d_pts_direct + d_rawf[:, :3], d_emb, w_grads
    if fwd_vals is not None:
        warp_vals = fwd_vals
    else:
        warp_vals = yield from ff._forward_tile_gen(s.warp_fs, raw_f,
                                                    warp_wbs)
    g_w = jnp.concatenate(
        [d_warped, jnp.zeros((t, ff.OUT_PAD - 3), jnp.float32)], axis=-1)
    d_rawf_w, w_grads = yield from ff._backward_tile_gen(
        s.warp_fs, raw_f, g_w, warp_wbs, fwd_vals=warp_vals)
    # Residual: d_pts gets d_warped directly.
    return d_warped + d_rawf_w[:, :3], d_rawf_w[:, 3:], w_grads


def _warp_bwd_tile(spec: FusedLevelSpec, pts, raw_f, warp_wbs, d_warped,
                   warp_scales=None, fwd_vals=None):
    """Backward through the warp for one tile.

    Returns (d_pts, d_emb, w_grads): gradients w.r.t. the input points and
    embedding plus the warp-net weight grads. For the translation residual,
    d_pts includes the identity path; for SE(3)/quaternion the retraction
    uses the hand-derived component-major VJP. ``fwd_vals`` reuses a tile
    forward already computed by the caller.
    """
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_warp_bwd_tile_gen(spec, pts, raw_f, warp_wbs, d_warped,
                                    warp_scales, fwd_vals))


def _make_bwd_kernel(spec: FusedLevelSpec, has_ac: bool):
    s = spec

    def kernel(*refs):
        x_ref = refs[0]
        off = 1
        od_ref = refs[off] if s.cond_samples else None
        off += 1 if s.cond_samples else 0
        emb_ref = refs[off] if s.cond_samples else None
        off += 1 if s.cond_samples else 0
        rgbc_ref = refs[off]; off += 1
        alphac_ref = refs[off] if has_ac else None
        off += 1 if has_ac else 0
        warp_scales = refs[off][:] if s.warp_windowed else None
        off += 1 if s.warp_windowed else 0
        tmpl_scales = refs[off][:] if not s.use_original_embed else None
        off += 0 if s.use_original_embed else 1
        g_ref = refs[off]; off += 1
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(s.n_layers)]
        o = off + 2 * s.n_layers
        dx_ref = refs[o]; o += 1
        dod_ref = refs[o] if s.cond_samples else None
        o += 1 if s.cond_samples else 0
        demb_ref = refs[o] if s.cond_samples else None
        o += 1 if s.cond_samples else 0
        drgbc_ref = refs[o]; o += 1
        dalphac_ref = refs[o] if has_ac else None
        o += 1 if has_ac else 0
        dwb_refs = refs[o:o + 2 * s.n_layers]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in dwb_refs:
                r[:] = jnp.zeros(r.shape, r.dtype)

        x_raw, od_exp = _assemble_raw(s, x_ref, od_ref, emb_ref)
        if s.cond_samples:
            rgbc = fm._expand_rays(rgbc_ref[0], x_raw.shape[0])
            alphac = (fm._expand_rays(alphac_ref[0], x_raw.shape[0])
                      if has_ac else None)
        else:
            rgbc = rgbc_ref[:]
            alphac = alphac_ref[:] if has_ac else None
        warp_wbs, hyper_wbs, tmpl_wbs = _split_wbs(s, wbs)

        # Recompute the chain up to the template input (field stashes are
        # reused by their backward passes below — no duplicate recompute).
        pts = x_raw[:, :3].astype(jnp.float32)
        raw_f = x_raw[:, :3 + s.embed_ch]
        warped, warp_vals = _warp_fwd_tile(s, pts, raw_f, warp_wbs,
                                           warp_scales)
        if s.slice_method == 'bendy_sheet':
            hyper_vals = ff._forward_tile(
                s.hyper_fs, raw_f, hyper_wbs,
                trig=_hyper_trig_from_warp(s, warp_vals))
            hyper = hyper_vals[-1][:, :s.hyper_out]
        else:
            hyper = raw_f[:, 3:3 + s.embed_ch].astype(jnp.float32)
        raw_t = jnp.concatenate([warped, hyper], axis=-1)
        t = x_raw.shape[0]

        # Template backward (includes its posenc VJP): dx_t is (T, 3+H).
        dx_t, drgbc, dalphac, t_grads = fm._backward_tile(
            s.tmpl_fs, raw_t, rgbc, alphac, g_ref[:], tmpl_wbs,
            enc_scales=tmpl_scales)
        d_warped = dx_t[:, :3]
        d_hyper = dx_t[:, 3:3 + s.hyper_out]

        if s.slice_method == 'bendy_sheet':
            # Hyper-sheet backward.
            g_h = jnp.concatenate(
                [d_hyper,
                 jnp.zeros((t, ff.OUT_PAD - s.hyper_out), jnp.float32)],
                axis=-1)
            d_rawf_h, h_grads = ff._backward_tile(
                s.hyper_fs, raw_f, g_h, hyper_wbs, fwd_vals=hyper_vals)
        else:
            d_rawf_h, h_grads = None, []

        # Warp backward (residual translation or SE(3) exponential).
        d_pts_w, d_emb_w, w_grads = _warp_bwd_tile(
            s, pts, raw_f, warp_wbs, d_warped, warp_scales,
            fwd_vals=warp_vals)

        if s.slice_method == 'bendy_sheet':
            d_pts = d_pts_w + d_rawf_h[:, :3]
            d_emb = d_emb_w + d_rawf_h[:, 3:]
        else:
            # Plane slicing: d_hyper IS the embed gradient.
            d_pts = d_pts_w
            d_emb = d_emb_w + d_hyper
        if s.cond_samples:
            _write_ray_grads(s, x_ref, od_exp, d_pts, d_emb,
                             dx_ref, dod_ref, demb_ref)
            drgbc_ref[0] = fm._reduce_rays(
                drgbc, drgbc_ref.shape[1]).astype(drgbc_ref.dtype)
            if has_ac:
                dalphac_ref[0] = fm._reduce_rays(
                    dalphac, dalphac_ref.shape[1]).astype(dalphac_ref.dtype)
        else:
            d_raw = jnp.concatenate(
                [d_pts, d_emb,
                 jnp.zeros((t, RAW_PAD - 3 - s.embed_ch), jnp.float32)],
                axis=-1)
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
    if spec.warp_type in ('se3', 'quaternion'):
        warp_padded = fs3._pad_params(spec.warp_fs, warp_pairs)
    else:
        warp_padded = ff._pad_params(spec.warp_fs, warp_pairs)
    hyper_padded = (ff._pad_params(spec.hyper_fs, hyper_pairs)
                    if spec.slice_method == 'bendy_sheet' else [])
    return warp_padded + hyper_padded + fm._pad_params(spec.tmpl_fs,
                                                       tmpl_pairs)


def _data_specs(spec, widths):
    return [pl.BlockSpec((spec.tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for w in widths]


def _cond_io(spec, arrays, n_tiles):
    """Per-ray condition inputs: tiled 3-D arrays + their block specs.

    Per-point mode passes through with plain (tile, C) blocks. Per-ray mode
    reshapes each (R, C) to (n_tiles, R/n_tiles, C) with a full (1, rows, C)
    block (see fused_mlp.cond_to_tiles for why 3-D).
    """
    if not spec.cond_samples:
        return list(arrays), [
            pl.BlockSpec((spec.tile, a.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for a in arrays]
    rows = fm.cond_tile_rows(spec)
    tiled = [fm.cond_to_tiles(a, n_tiles) for a in arrays]
    return tiled, [fm.cond_spec3(rows, a.shape[1]) for a in arrays]


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
        off = 1
        od_ref = refs[off] if s.cond_samples else None
        off += 1 if s.cond_samples else 0
        emb_ref = refs[off] if s.cond_samples else None
        off += 1 if s.cond_samples else 0
        warp_scales = refs[off][:] if s.warp_windowed else None
        off += 1 if s.warp_windowed else 0
        dxt_ref = refs[off]; off += 1
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(n_field_layers)]
        o = off + 2 * n_field_layers
        dx_ref = refs[o]; o += 1
        dod_ref = refs[o] if s.cond_samples else None
        o += 1 if s.cond_samples else 0
        demb_ref = refs[o] if s.cond_samples else None
        o += 1 if s.cond_samples else 0
        dwb_refs = refs[o:o + 2 * n_field_layers]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in dwb_refs:
                r[:] = jnp.zeros(r.shape, r.dtype)

        from hypernerf_tpu.ops.pallas.common import drive
        x_raw, od_exp = _assemble_raw(s, x_ref, od_ref, emb_ref)
        t = x_raw.shape[0]
        warp_wbs = wbs[:s.n_warp_layers]
        hyper_wbs = wbs[s.n_warp_layers:]
        d_pts, d_emb, f_grads = drive(_fields_bwd_core_gen(
            s, x_raw, dxt_ref[:], warp_wbs, hyper_wbs, warp_scales))
        if s.cond_samples:
            _write_ray_grads(s, x_ref, od_exp, d_pts, d_emb,
                             dx_ref, dod_ref, demb_ref)
        else:
            d_raw = jnp.concatenate(
                [d_pts, d_emb,
                 jnp.zeros((t, RAW_PAD - 3 - s.embed_ch), jnp.float32)],
                axis=-1)
            dx_ref[:] = d_raw.astype(dx_ref.dtype)
        for k, (dw, db) in enumerate(f_grads):
            dwb_refs[2 * k][:] += dw
            dwb_refs[2 * k + 1][:] += db
    return kernel


def _fields_bwd_call(spec: FusedLevelSpec, x_raw, od, emb, dx_t,
                     field_padded_wbs, warp_scales=None):
    s = spec._replace(tile=spec.bwd_tile or spec.tile)
    p = x_raw.shape[0]
    n_tiles = p // s.tile
    w_in, w_specs = _weight_specs(field_padded_wbs)
    ray_in, ray_specs = [], []
    if s.cond_samples:
        ray_in, ray_specs = _cond_io(s, [od, emb], n_tiles)
    sc_in, sc_specs = [], []
    if s.warp_windowed:
        sc_in = [warp_scales]
        sc_specs = [pl.BlockSpec((1, warp_scales.shape[1]),
                                 lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)]
    in_specs = (_data_specs(s, [x_raw.shape[1]]) + ray_specs + sc_specs
                + _data_specs(s, [s.tmpl_raw_pad]) + w_specs)
    out_shapes = [jax.ShapeDtypeStruct((p, x_raw.shape[1]), jnp.float32)]
    out_specs = _data_specs(s, [x_raw.shape[1]])
    if s.cond_samples:
        out_shapes += [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                       for a in ray_in]
        out_specs += ray_specs
    for w, b in field_padded_wbs:
        out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                       jax.ShapeDtypeStruct(b.shape, jnp.float32)]
        out_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        _make_fields_bwd_kernel(s),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(x_raw, *ray_in, *sc_in, dx_t, *w_in)
    if s.cond_samples:
        outs = list(outs)
        outs[1] = outs[1].reshape(od.shape)
        outs[2] = outs[2].reshape(emb.shape)
        outs = tuple(outs)
    return outs


def _make_pipelined_fwd_kernel(spec: FusedLevelSpec, has_ac: bool):
    """One-kernel forward, software-pipelined across the grid.

    Grid step i interleaves the FIELDS forward of tile i with the TEMPLATE
    forward of tile i-1; raw_t = [warped | hyper] rides a VMEM scratch
    (read-before-write keeps one slot sufficient). Phantom steps: at i == 0
    the template consumes a zeroed scratch and its output write is masked;
    at i == n the fields stage recomputes tile n-1 bit-identically (same
    block, same weights), so its rawt/scratch writes are harmless.
    """
    s = spec
    nf = s.n_warp_layers + s.n_hyper_layers

    def kernel(*refs):
        from hypernerf_tpu.ops.pallas.common import interleave
        x_ref = refs[0]
        off = 1
        od_ref = refs[off] if s.cond_samples else None
        off += 1 if s.cond_samples else 0
        emb_ref = refs[off] if s.cond_samples else None
        off += 1 if s.cond_samples else 0
        rgbc_ref = refs[off]; off += 1
        alphac_ref = refs[off] if has_ac else None
        off += 1 if has_ac else 0
        warp_scales = refs[off][:] if s.warp_windowed else None
        off += 1 if s.warp_windowed else 0
        tmpl_scales = refs[off][:] if not s.use_original_embed else None
        off += 0 if s.use_original_embed else 1
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(s.n_layers)]
        warp_wbs = wbs[:s.n_warp_layers]
        hyper_wbs = wbs[s.n_warp_layers:nf]
        tmpl_wbs = wbs[nf:]
        o = off + 2 * s.n_layers
        out_ref = refs[o]
        rawt_ref = refs[o + 1]
        rawt_scr = refs[o + 2]

        i = pl.program_id(0)
        n = pl.num_programs(0) - 1

        @pl.when(i == 0)
        def _():
            rawt_scr[:] = jnp.zeros(rawt_scr.shape, rawt_scr.dtype)

        # Previous step's fields output (zeros at i == 0; write masked).
        raw_t_prev = rawt_scr[:]
        t = raw_t_prev.shape[0]

        # Fields stage inputs (tile i).
        x_raw, _ = _assemble_raw(s, x_ref, od_ref, emb_ref)
        # Template stage conditions (tile i-1).
        if s.cond_samples:
            rgbc = fm._expand_rays(rgbc_ref[0], t)
            alphac = fm._expand_rays(alphac_ref[0], t) if has_ac else None
        else:
            rgbc = rgbc_ref[:]
            alphac = alphac_ref[:] if has_ac else None

        fields_res, tmpl_res = interleave(
            _fields_fwd_core_gen(s, x_raw, warp_wbs, hyper_wbs,
                                 warp_scales),
            fm._forward_tile_gen(s.tmpl_fs, raw_t_prev, rgbc, alphac,
                                 tmpl_wbs, enc_scales=tmpl_scales))
        raw_t_new = fields_res
        rgb, alpha, _ = tmpl_res

        rawt_pad = jnp.concatenate(
            [raw_t_new,
             jnp.zeros((t, s.tmpl_raw_pad - raw_t_new.shape[1]),
                       jnp.float32)], axis=-1)
        rawt_scr[:] = rawt_pad
        rawt_ref[:] = rawt_pad

        @pl.when(i > 0)
        def _():
            out_ref[:] = jnp.concatenate(
                [rgb[:, :s.rgb_channels], alpha[:, :s.alpha_channels],
                 jnp.zeros((t, OUT_PAD - s.rgb_channels - s.alpha_channels),
                           jnp.float32)], axis=-1)
    return kernel


def _fwd_call_pipelined(spec, x_raw, od, emb, rgbc, alphac, warp_scales,
                        tmpl_scales, padded_flat):
    """Launch the pipelined forward; returns (out, raw_t) like _fused."""
    s = spec
    p = x_raw.shape[0]
    n_tiles = p // s.tile
    has_ac = alphac is not None
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]

    def im_a2(i):
        return (jnp.minimum(i, n_tiles - 1), 0)

    def im_b2(i):
        return (jnp.maximum(i - 1, 0), 0)

    def im_a3(i):
        return (jnp.minimum(i, n_tiles - 1), 0, 0)

    def im_b3(i):
        return (jnp.maximum(i - 1, 0), 0, 0)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    rows = fm.cond_tile_rows(s) if s.cond_samples else 0

    def cond3(a, im):
        return (fm.cond_to_tiles(a, n_tiles),
                pl.BlockSpec((1, rows, a.shape[1]), im,
                             memory_space=pltpu.VMEM))

    data_in, in_specs = [x_raw], [
        pl.BlockSpec((s.tile, x_raw.shape[1]), im_a2,
                     memory_space=pltpu.VMEM)]
    if s.cond_samples:
        for a in (od, emb):
            t_a, t_spec = cond3(a, im_a3)
            data_in.append(t_a)
            in_specs.append(t_spec)
        rgbc_t, rgbc_spec = cond3(rgbc, im_b3)
        data_in.append(rgbc_t)
        in_specs.append(rgbc_spec)
        if has_ac:
            alphac_t, alphac_spec = cond3(alphac, im_b3)
            data_in.append(alphac_t)
            in_specs.append(alphac_spec)
    else:
        data_in.append(rgbc)
        in_specs.append(pl.BlockSpec((s.tile, rgbc.shape[1]), im_b2,
                                     memory_space=pltpu.VMEM))
        if has_ac:
            data_in.append(alphac)
            in_specs.append(pl.BlockSpec((s.tile, alphac.shape[1]), im_b2,
                                         memory_space=pltpu.VMEM))
    if s.warp_windowed:
        data_in.append(warp_scales)
        in_specs.append(full_spec(warp_scales))
    if not s.use_original_embed:
        data_in.append(tmpl_scales)
        in_specs.append(full_spec(tmpl_scales))
    for w, b in padded_wbs:
        data_in += [w, b]
        in_specs += [full_spec(w), full_spec(b)]

    out_shapes = [jax.ShapeDtypeStruct((p, OUT_PAD), jnp.float32),
                  jax.ShapeDtypeStruct((p, s.tmpl_raw_pad), jnp.float32)]
    out_specs = [
        pl.BlockSpec((s.tile, OUT_PAD), im_b2, memory_space=pltpu.VMEM),
        pl.BlockSpec((s.tile, s.tmpl_raw_pad), im_a2,
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        _make_pipelined_fwd_kernel(s, has_ac),
        grid=(n_tiles + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((s.tile, s.tmpl_raw_pad), jnp.float32)],
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(*data_in)


def _make_pipelined_bwd_kernel(spec: FusedLevelSpec, has_ac: bool):
    """One-kernel backward, software-pipelined across the grid.

    Grid step i interleaves (common.interleave) the TEMPLATE backward of
    tile i with the FIELDS backward of tile i-1; dx_t = d(warped|hyper)
    rides a VMEM scratch between steps (read-before-write keeps one slot
    sufficient). The grid has one extra phantom step: at i == 0 the fields
    stage consumes a zeroed scratch (its dW contributions are exact zeros
    by linearity in dx_t) and at i == n the template stage runs with a
    zeroed g (same argument); both phantom stages' per-tile writes are
    masked. Every stream's internal op order matches the split kernels, so
    the numerics are identical up to fp32 +0.0 accumulator no-ops.
    """
    s = spec
    nf = s.n_warp_layers + s.n_hyper_layers
    nt = s.n_tmpl_layers

    def kernel(*refs):
        from hypernerf_tpu.ops.pallas.common import interleave
        x_ref = refs[0]
        off = 1
        od_ref = refs[off] if s.cond_samples else None
        off += 1 if s.cond_samples else 0
        emb_ref = refs[off] if s.cond_samples else None
        off += 1 if s.cond_samples else 0
        rawt_ref = refs[off]; off += 1
        rgbc_ref = refs[off]; off += 1
        alphac_ref = refs[off] if has_ac else None
        off += 1 if has_ac else 0
        warp_scales = refs[off][:] if s.warp_windowed else None
        off += 1 if s.warp_windowed else 0
        tmpl_scales = refs[off][:] if not s.use_original_embed else None
        off += 0 if s.use_original_embed else 1
        g_ref = refs[off]; off += 1
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(nf + nt)]
        warp_wbs = wbs[:s.n_warp_layers]
        hyper_wbs = wbs[s.n_warp_layers:nf]
        tmpl_wbs = wbs[nf:]
        o = off + 2 * (nf + nt)
        dx_ref = refs[o]; o += 1
        dod_ref = refs[o] if s.cond_samples else None
        o += 1 if s.cond_samples else 0
        demb_ref = refs[o] if s.cond_samples else None
        o += 1 if s.cond_samples else 0
        drgbc_ref = refs[o]; o += 1
        dalphac_ref = refs[o] if has_ac else None
        o += 1 if has_ac else 0
        dwb_refs = refs[o:o + 2 * (nf + nt)]
        dxt_scr = refs[o + 2 * (nf + nt)]

        i = pl.program_id(0)
        n = pl.num_programs(0) - 1

        @pl.when(i == 0)
        def _():
            for r in dwb_refs:
                r[:] = jnp.zeros(r.shape, r.dtype)
            dxt_scr[:] = jnp.zeros(dxt_scr.shape, dxt_scr.dtype)

        # Previous step's template cotangent (zeros at i == 0).
        dx_t_prev = dxt_scr[:]

        # Template stage inputs (tile i; the phantom last step gets g == 0).
        last = i == n
        g_all = jnp.where(last, 0.0, g_ref[:])
        raw_t = rawt_ref[:]
        t = raw_t.shape[0]
        if s.cond_samples:
            rgbc = fm._expand_rays(rgbc_ref[0], t)
            alphac = fm._expand_rays(alphac_ref[0], t) if has_ac else None
        else:
            rgbc = rgbc_ref[:]
            alphac = alphac_ref[:] if has_ac else None

        # Fields stage inputs (tile i-1).
        x_raw, od_exp = _assemble_raw(s, x_ref, od_ref, emb_ref)

        tmpl_res, fields_res = interleave(
            fm._backward_tile_gen(s.tmpl_fs, raw_t, rgbc, alphac, g_all,
                                  tmpl_wbs, enc_scales=tmpl_scales),
            _fields_bwd_core_gen(s, x_raw, dx_t_prev, warp_wbs, hyper_wbs,
                                 warp_scales))
        dxt_new, drgbc, dalphac_g, t_grads = tmpl_res
        d_pts, d_emb, f_grads = fields_res

        # Carry dx_t to the next grid step.
        dxt_scr[:] = jnp.concatenate(
            [dxt_new,
             jnp.zeros((t, s.tmpl_raw_pad - dxt_new.shape[1]), jnp.float32)],
            axis=-1)

        @pl.when(jnp.logical_not(last))
        def _():
            if s.cond_samples:
                drgbc_ref[0] = fm._reduce_rays(
                    drgbc, drgbc_ref.shape[1]).astype(drgbc_ref.dtype)
                if has_ac:
                    dalphac_ref[0] = fm._reduce_rays(
                        dalphac_g,
                        dalphac_ref.shape[1]).astype(dalphac_ref.dtype)
            else:
                drgbc_ref[:] = drgbc.astype(drgbc_ref.dtype)
                if has_ac:
                    dalphac_ref[:] = dalphac_g.astype(dalphac_ref.dtype)

        @pl.when(i > 0)
        def _():
            if s.cond_samples:
                _write_ray_grads(s, x_ref, od_exp, d_pts, d_emb,
                                 dx_ref, dod_ref, demb_ref)
            else:
                d_raw = jnp.concatenate(
                    [d_pts, d_emb,
                     jnp.zeros((t, RAW_PAD - 3 - s.embed_ch), jnp.float32)],
                    axis=-1)
                dx_ref[:] = d_raw.astype(dx_ref.dtype)

        for k, (dw, db) in enumerate(f_grads + t_grads):
            dwb_refs[2 * k][:] += dw
            dwb_refs[2 * k + 1][:] += db
    return kernel


def _fused_bwd_pipelined(spec, x_raw, od, emb, rgbc, alphac, warp_scales,
                         tmpl_scales, padded_flat, raw_t, g):
    """Launch the pipelined one-kernel backward (see
    _make_pipelined_bwd_kernel). Returns the same tuple as
    _fused_bwd_split."""
    s = spec._replace(tile=spec.bwd_tile or spec.tile)
    p = x_raw.shape[0]
    n_tiles = p // s.tile
    has_ac = alphac is not None
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]

    def im_f2(i):
        return (jnp.maximum(i - 1, 0), 0)

    def im_t2(i):
        return (jnp.minimum(i, n_tiles - 1), 0)

    def im_f3(i):
        return (jnp.maximum(i - 1, 0), 0, 0)

    def im_t3(i):
        return (jnp.minimum(i, n_tiles - 1), 0, 0)

    def full_spec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                            memory_space=pltpu.VMEM)

    rows = fm.cond_tile_rows(s) if s.cond_samples else 0

    def cond3(a, im):
        return (fm.cond_to_tiles(a, n_tiles),
                pl.BlockSpec((1, rows, a.shape[1]), im,
                             memory_space=pltpu.VMEM))

    data_in, in_specs = [x_raw], [
        pl.BlockSpec((s.tile, x_raw.shape[1]), im_f2,
                     memory_space=pltpu.VMEM)]
    if s.cond_samples:
        for a in (od, emb):
            t_a, t_spec = cond3(a, im_f3)
            data_in.append(t_a)
            in_specs.append(t_spec)
    data_in.append(raw_t)
    in_specs.append(pl.BlockSpec((s.tile, s.tmpl_raw_pad), im_t2,
                                 memory_space=pltpu.VMEM))
    if s.cond_samples:
        rgbc_t, rgbc_spec = cond3(rgbc, im_t3)
        data_in.append(rgbc_t)
        in_specs.append(rgbc_spec)
        if has_ac:
            alphac_t, alphac_spec = cond3(alphac, im_t3)
            data_in.append(alphac_t)
            in_specs.append(alphac_spec)
    else:
        rgbc_t = rgbc
        rgbc_spec = pl.BlockSpec((s.tile, rgbc.shape[1]), im_t2,
                                 memory_space=pltpu.VMEM)
        data_in.append(rgbc)
        in_specs.append(rgbc_spec)
        if has_ac:
            alphac_t = alphac
            alphac_spec = pl.BlockSpec((s.tile, alphac.shape[1]), im_t2,
                                       memory_space=pltpu.VMEM)
            data_in.append(alphac)
            in_specs.append(alphac_spec)
    if s.warp_windowed:
        data_in.append(warp_scales)
        in_specs.append(full_spec(warp_scales))
    if not s.use_original_embed:
        data_in.append(tmpl_scales)
        in_specs.append(full_spec(tmpl_scales))
    data_in.append(g)
    in_specs.append(pl.BlockSpec((s.tile, OUT_PAD), im_t2,
                                 memory_space=pltpu.VMEM))
    for w, b in padded_wbs:
        data_in += [w, b]
        in_specs += [full_spec(w), full_spec(b)]

    out_shapes = [jax.ShapeDtypeStruct((p, x_raw.shape[1]), jnp.float32)]
    out_specs = [pl.BlockSpec((s.tile, x_raw.shape[1]), im_f2,
                              memory_space=pltpu.VMEM)]
    if s.cond_samples:
        for a in (od, emb):
            t_a, t_spec = cond3(a, im_f3)
            out_shapes.append(jax.ShapeDtypeStruct(t_a.shape, jnp.float32))
            out_specs.append(t_spec)
        out_shapes.append(jax.ShapeDtypeStruct(rgbc_t.shape, jnp.float32))
        out_specs.append(cond3(rgbc, im_t3)[1])
        if has_ac:
            out_shapes.append(jax.ShapeDtypeStruct(alphac_t.shape,
                                                   jnp.float32))
            out_specs.append(cond3(alphac, im_t3)[1])
    else:
        out_shapes.append(jax.ShapeDtypeStruct(rgbc.shape, jnp.float32))
        out_specs.append(rgbc_spec)
        if has_ac:
            out_shapes.append(jax.ShapeDtypeStruct(alphac.shape,
                                                   jnp.float32))
            out_specs.append(alphac_spec)
    for w, b in padded_wbs:
        out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                       jax.ShapeDtypeStruct(b.shape, jnp.float32)]
        out_specs += [full_spec(w), full_spec(b)]

    outs = pl.pallas_call(
        _make_pipelined_bwd_kernel(s, has_ac),
        grid=(n_tiles + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((s.tile, s.tmpl_raw_pad), jnp.float32)],
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(*data_in)
    dx = outs[0].astype(x_raw.dtype)
    o = 1
    if s.cond_samples:
        dod = outs[o].reshape(od.shape).astype(od.dtype); o += 1
        demb = outs[o].reshape(emb.shape).astype(emb.dtype); o += 1
    else:
        dod, demb = None, None
    drgbc = outs[o].reshape(rgbc.shape).astype(rgbc.dtype); o += 1
    dalphac = (outs[o].reshape(alphac.shape).astype(alphac.dtype)
               if has_ac else None)
    o += 1 if has_ac else 0
    dflat = tuple(outs[o + k].astype(padded_flat[k].dtype)
                  for k in range(len(padded_flat)))
    return dx, dod, demb, drgbc, dalphac, dflat


def _tmpl_scales_specs(spec, tmpl_scales):
    if spec.use_original_embed:
        return [], []
    return [tmpl_scales], [pl.BlockSpec((1, tmpl_scales.shape[1]),
                                        lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)]


def _warp_scales_specs(spec, warp_scales):
    if not spec.warp_windowed:
        return [], []
    return [warp_scales], [pl.BlockSpec((1, warp_scales.shape[1]),
                                        lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(spec, x_raw, od, emb, rgbc, alphac, warp_scales, tmpl_scales,
           padded_flat):
    s = spec
    if s.pipelined_fwd:
        return _fwd_call_pipelined(s, x_raw, od, emb, rgbc, alphac,
                                   warp_scales, tmpl_scales, padded_flat)
    p = x_raw.shape[0]
    n_tiles = p // s.tile
    has_ac = alphac is not None
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    cond_in, cond_specs = _cond_io(
        s, ([od, emb] if s.cond_samples else []) + [rgbc]
        + ([alphac] if has_ac else []), n_tiles)
    in_specs = _data_specs(s, [x_raw.shape[1]]) + cond_specs
    data_in = [x_raw] + cond_in
    wsc_in, wsc_specs = _warp_scales_specs(s, warp_scales)
    sc_in, sc_specs = _tmpl_scales_specs(s, tmpl_scales)
    w_in, w_specs = _weight_specs(padded_wbs)
    return pl.pallas_call(
        _make_fwd_kernel(s, has_ac),
        grid=(n_tiles,),
        in_specs=in_specs + wsc_specs + sc_specs + w_specs,
        out_specs=[
            pl.BlockSpec((s.tile, OUT_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s.tile, s.tmpl_raw_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((p, OUT_PAD), jnp.float32),
                   jax.ShapeDtypeStruct((p, s.tmpl_raw_pad), jnp.float32)],
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(*data_in, *wsc_in, *sc_in, *w_in)


def _fused_fwd(spec, x_raw, od, emb, rgbc, alphac, warp_scales, tmpl_scales,
               padded_flat):
    out, raw_t = _fused(spec, x_raw, od, emb, rgbc, alphac, warp_scales,
                        tmpl_scales, padded_flat)
    return (out, raw_t), (x_raw, od, emb, rgbc, alphac, warp_scales,
                          tmpl_scales, padded_flat, raw_t)


def _fused_bwd(spec, res, g):
    (x_raw, od, emb, rgbc, alphac, warp_scales, tmpl_scales, padded_flat,
     raw_t) = res
    # raw_t is an internal residual output; its cotangent (g[1]) is always
    # zero because fused_level never exposes it.
    g = g[0]
    d_scales = (None if tmpl_scales is None
                else jnp.zeros_like(tmpl_scales))
    d_wscales = (None if warp_scales is None
                 else jnp.zeros_like(warp_scales))
    if spec.pipelined_bwd:
        dx, dod, demb, drgbc, dalphac, dflat = _fused_bwd_pipelined(
            spec, x_raw, od, emb, rgbc, alphac, warp_scales, tmpl_scales,
            padded_flat, raw_t, g)
        return (dx, dod, demb, drgbc, dalphac, d_wscales, d_scales, dflat)
    if spec.split_bwd:
        dx, dod, demb, drgbc, dalphac, dflat = _fused_bwd_split(
            spec, x_raw, od, emb, rgbc, alphac, warp_scales, tmpl_scales,
            padded_flat, raw_t, g)
        return (dx, dod, demb, drgbc, dalphac, d_wscales, d_scales, dflat)
    s = spec._replace(tile=spec.bwd_tile or spec.tile)
    p = x_raw.shape[0]
    n_tiles = p // s.tile
    has_ac = alphac is not None
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    cond_in, cond_specs = _cond_io(
        s, ([od, emb] if s.cond_samples else []) + [rgbc]
        + ([alphac] if has_ac else []), n_tiles)
    in_specs = _data_specs(s, [x_raw.shape[1]]) + cond_specs
    data_in = [x_raw] + cond_in
    wsc_in, wsc_specs = _warp_scales_specs(s, warp_scales)
    sc_in, sc_specs = _tmpl_scales_specs(s, tmpl_scales)
    data_in += wsc_in + sc_in + [g]
    w_in, w_specs = _weight_specs(padded_wbs)
    g_spec = pl.BlockSpec((s.tile, OUT_PAD), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)

    out_shapes = [jax.ShapeDtypeStruct((p, x_raw.shape[1]), jnp.float32)]
    out_specs = _data_specs(s, [x_raw.shape[1]])
    out_shapes += [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                   for a in cond_in]
    out_specs += cond_specs
    for w, b in padded_wbs:
        out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                       jax.ShapeDtypeStruct(b.shape, jnp.float32)]
        out_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    outs = pl.pallas_call(
        _make_bwd_kernel(s, has_ac),
        grid=(n_tiles,),
        in_specs=(in_specs + wsc_specs + sc_specs + [g_spec]
                  + w_specs),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(*data_in, *w_in)
    dx = outs[0].astype(x_raw.dtype)
    o = 1
    if s.cond_samples:
        dod = outs[o].reshape(od.shape).astype(od.dtype); o += 1
        demb = outs[o].reshape(emb.shape).astype(emb.dtype); o += 1
    else:
        dod, demb = None, None
    drgbc = outs[o].reshape(rgbc.shape).astype(rgbc.dtype); o += 1
    dalphac = (outs[o].reshape(alphac.shape).astype(alphac.dtype)
               if has_ac else None)
    o += 1 if has_ac else 0
    dflat = tuple(outs[o + k].astype(padded_flat[k].dtype)
                  for k in range(len(padded_flat)))
    return dx, dod, demb, drgbc, dalphac, d_wscales, d_scales, dflat



def _fused_bwd_split(spec, x_raw, od, emb, rgbc, alphac, warp_scales,
                     tmpl_scales, padded_flat, raw_t, g):
    """Two-kernel backward: template bwd (fused_mlp's, larger tile) then a
    lean fields bwd, stitched through dx_t = d(warped|hyper)."""
    s = spec
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    nw, nh = s.n_warp_layers, s.n_hyper_layers
    field_wbs = padded_wbs[:nw + nh]
    tmpl_wbs = padded_wbs[nw + nh:]

    outs_t = fm._bwd_call(s.tmpl_fs, raw_t, rgbc, alphac, tmpl_wbs, g,
                          enc_scales=tmpl_scales)
    has_ac = alphac is not None
    dx_t = outs_t[0]            # (P, s.tmpl_raw_pad) fp32
    drgbc = outs_t[1].astype(rgbc.dtype)
    o = 2
    dalphac = outs_t[o].astype(alphac.dtype) if has_ac else None
    o += 1 if has_ac else 0
    tmpl_dflat = list(outs_t[o:])

    outs_f = _fields_bwd_call(s, x_raw, od, emb, dx_t, field_wbs,
                              warp_scales)
    dx = outs_f[0].astype(x_raw.dtype)
    o = 1
    if s.cond_samples:
        dod = outs_f[o].astype(od.dtype); o += 1
        demb = outs_f[o].astype(emb.dtype); o += 1
    else:
        dod, demb = None, None
    field_dflat = list(outs_f[o:])

    dflat_all = field_dflat + tmpl_dflat
    dflat = tuple(dflat_all[k].astype(padded_flat[k].dtype)
                  for k in range(len(padded_flat)))
    return dx, dod, demb, drgbc, dalphac, dflat


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_level(spec: FusedLevelSpec, points, embed, rgb_cond, alpha_cond,
                warp_pairs, hyper_pairs, tmpl_pairs, tmpl_enc_scales=None,
                warp_enc_scales=None, origins=None, directions=None,
                z_vals=None, return_packed: bool = False):
    """Evaluate the full fused level.

    Args:
      spec: static FusedLevelSpec.
      points: (P, 3) sample positions (per-point mode; None in ray mode).
      embed: (P, embed_ch) per-sample warp/hyper embedding (shared — the
        share_GLO default; models.py:167) — or (P // S, embed_ch) PER-RAY
        when spec.cond_samples = S > 0.
      rgb_cond: (P, rgb_cond_ch); alpha_cond: (P, alpha_cond_ch) or None.
        When spec.cond_samples = S > 0, both are PER-RAY (P // S rows) and
        are expanded/reduced in-kernel (no per-point HBM broadcast).
      origins / directions / z_vals: ray mode (cond_samples > 0) inputs —
        (R, 3), (R, 3) per-ray and (R, S) per-sample depths; the kernel
        computes o + z*d in VMEM (models.py's points never hit HBM) and
        returns d_o/d_d summed per ray and d_z per sample.
      warp_pairs / hyper_pairs: (W, b) lists in MLP order.
      tmpl_pairs: (W, b) list in NerfMLP order.
      tmpl_enc_scales: (1, tmpl in_pad) annealing-window row for the
        template's Nerfies encoding (required iff use_original_embed=False;
        build with fused_field.encoding_scales over tmpl_enc_segments).
      warp_enc_scales: (1, se3 enc_pad) warp_alpha window row (required iff
        warp_windowed; se3 only).

    Returns:
      {'rgb': (P, 3) raw logits, 'alpha': (P, 1) raw density} fp32.
    """
    s = spec
    assert s.cond_samples or 3 + s.embed_ch <= RAW_PAD, \
        'embed too wide for RAW_PAD'
    assert (tmpl_enc_scales is not None) == (not s.use_original_embed)
    assert (warp_enc_scales is not None) == s.warp_windowed
    assert not (s.warp_windowed
                and s.warp_type not in ('se3', 'quaternion')), \
        'warp window applies to the SE(3)/quaternion encoding only'
    if s.slice_method != 'bendy_sheet':
        assert s.hyper_out == s.embed_ch, \
            'plane slicing: the hyper coords are the embed itself'
        assert not hyper_pairs, 'plane slicing has no hyper MLP'
    import math as _math
    if s.cond_samples:
        assert points is None and z_vals is not None
        r = z_vals.shape[0]
        p = r * s.cond_samples
        assert z_vals.shape == (r, s.cond_samples), z_vals.shape
    else:
        p = points.shape[0]
    granularity = _math.lcm(
        s.tile, s.bwd_tile or s.tile,
        s.tmpl_bwd_tile if (s.split_bwd and not s.pipelined_bwd) else 1)
    if s.cond_samples:
        assert granularity % s.cond_samples == 0, \
            'tiles must hold whole rays when cond_samples is set'
        assert rgb_cond.shape[0] == p // s.cond_samples, \
            (rgb_cond.shape, p, s.cond_samples)
    p_pad = _rup(p, granularity)

    def pad_rows(a):
        return jnp.pad(a, ((0, p_pad - p), (0, 0))) if p_pad != p else a

    def pad_cond_rows(a):
        if not s.cond_samples:
            return pad_rows(a)
        r, r_pad = p // s.cond_samples, p_pad // s.cond_samples
        return jnp.pad(a, ((0, r_pad - r), (0, 0))) if r_pad != r else a

    dt = jnp.dtype(s.compute_dtype)
    if s.cond_samples:
        # Ray-native inputs: per-point z column + per-ray [o|d] and embed
        # rows; sample positions are computed inside the kernels.
        assert embed.shape[0] == p // s.cond_samples, \
            (embed.shape, p, s.cond_samples)
        x_raw = pad_rows(z_vals.astype(jnp.float32).reshape(p, 1))
        rz = jnp.zeros((origins.shape[0], 5), jnp.float32)
        od = pad_cond_rows(jnp.concatenate(
            [origins.astype(jnp.float32), rz,
             directions.astype(jnp.float32), rz], axis=-1))
        emb = pad_cond_rows(jnp.pad(
            embed.astype(jnp.float32),
            ((0, 0), (0, s.emb_pad - s.embed_ch))))
    else:
        x_raw = pad_rows(jnp.concatenate(
            [points.astype(jnp.float32), embed.astype(jnp.float32),
             jnp.zeros((p, RAW_PAD - 3 - s.embed_ch), jnp.float32)], axis=-1))
        od, emb = None, None
    rgbc = pad_cond_rows(jnp.pad(rgb_cond.astype(dt),
                                 ((0, 0), (0, s.tmpl_fs.rc - s.rgb_cond_ch))))
    if s.alpha_cond_ch:
        alphac = pad_cond_rows(jnp.pad(
            alpha_cond.astype(dt),
            ((0, 0), (0, s.tmpl_fs.ac - s.alpha_cond_ch))))
    else:
        alphac = None

    padded = _pad_all_params(s, warp_pairs, hyper_pairs, tmpl_pairs)
    padded_flat = tuple(a for wb in padded for a in wb)
    out, _raw_t = _fused(s, x_raw, od, emb, rgbc, alphac, warp_enc_scales,
                         tmpl_enc_scales, padded_flat)
    out = out[:p]
    if return_packed:
        # Raw (P, OUT_PAD) [rgb_logits | raw_sigma | 0...] for the fused
        # compositing kernel — avoids the slice->activate->repack HBM trips.
        return out
    return {'rgb': out[:, :s.rgb_channels],
            'alpha': out[:, s.rgb_channels:s.rgb_channels
                         + s.alpha_channels]}
