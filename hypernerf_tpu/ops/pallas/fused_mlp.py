"""Fused NeRF template MLP as a single Pallas TPU kernel.

The NerfMLP (trunk -> bottleneck -> alpha head + rgb branch,
models/modules.py) dominates the training FLOPs, but its XLA form streams
every activation tensor through HBM: at 8192 rays x 192 samples the trunk
alone moves ~10GB per step, and the backward re-reads all of it. All the
weights together are <1MB — they fit in VMEM many times over. So the whole
template is evaluated here as ONE kernel over tiles of sample points: weights
stay resident in VMEM across the grid, activations never touch HBM, and the
backward pass recomputes the forward per tile (flash-attention style) while
accumulating fp32 weight gradients in revisited output blocks.

Layout notes:
* All feature dims are zero-padded to multiples of 128 (the TPU lane width);
  zero rows/cols make padding exact (padded hidden units stay identically 0
  through ReLU and contribute nothing downstream).
* Output is a packed (P, 8) tile [rgb(3) | alpha(1) | 0...] so no wide padded
  tensor ever reaches HBM.
* The backward emits dX, per-sample condition gradients, and per-layer
  fp32 dW/db accumulated across the sequential TPU grid.

The pure-jnp reference lives in models/modules.py (NerfMLP); tests check this
kernel against it in interpret mode (CPU) and compiled (TPU).
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
RAW_PAD = 8  # minimum raw-point lane padding (see raw_pad_for)


def raw_pad_for(raw_ch: int) -> int:
    """Lane padding for raw-point inputs (multiple of 8, >= RAW_PAD)."""
    return max(RAW_PAD, ((raw_ch + 7) // 8) * 8)
HEAD_PAD = 8  # rgb (3) / alpha (1) heads padded to 8 output columns


def _rup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class FusedMLPSpec(NamedTuple):
    """Static configuration of the fused template (hashable)."""
    in_ch: int
    trunk_depth: int = 8
    trunk_width: int = 256
    rgb_depth: int = 4
    rgb_width: int = 128
    rgb_channels: int = 3
    alpha_channels: int = 1
    skips: Tuple[int, ...] = (4,)
    rgb_cond_ch: int = 39
    alpha_cond_ch: int = 0
    tile: int = 512
    interpret: bool = False
    compute_dtype: str = 'bfloat16'
    # When set, the kernel input is RAW points (P, sum seg_ch) and the
    # positional encoding ((ch, n_freq) per segment, posenc_orig block
    # layout) happens inside the kernel; in_ch must equal the encoded width.
    enc_segments: Tuple[Tuple[int, int], ...] = ()
    # Backward recompute keeps all activations of a tile live in VMEM, so it
    # needs a smaller tile than the forward (0 = same as tile).
    bwd_tile: int = 0
    # Take a (1, in_pad) per-feature annealing-window row for the in-kernel
    # encoding (requires enc_segments; see fused_field.encoding_scales).
    windowed: bool = False
    # When >0, the rgb/alpha condition inputs are PER-RAY rows (P //
    # cond_samples of them), each covering cond_samples consecutive sample
    # points; the kernel expands them in VMEM (one-hot matmul on the MXU)
    # and the backward emits per-ray condition grads (summed over each
    # ray's samples). Kills the (P, C) HBM broadcast the caller would
    # otherwise materialize. Requires tile % cond_samples == 0.
    cond_samples: int = 0
    # Run the hidden-layer epilogues (bias+relu) in the compute dtype
    # instead of fp32: the f32 add/max/convert trio costs ~one matmul-time
    # per 256-wide layer on the VPU (the forward's measured roof,
    # BENCHMARKS.md round 4); bf16 drops it to one f32->bf16 convert plus
    # two half-width ops. Changes bf16 numerics by one bias rounding per
    # layer (biases are already stored bf16 in VMEM); exact no-op at
    # compute_dtype float32.
    bf16_epilogue: bool = False

    @property
    def in_pad(self):
        return _rup(self.in_ch, LANE)

    @property
    def tw(self):
        return _rup(self.trunk_width, LANE)

    @property
    def bw(self):
        return _rup(self.trunk_width // 2, LANE)

    @property
    def rw(self):
        return _rup(self.rgb_width, LANE)

    @property
    def rc(self):
        return _rup(self.rgb_cond_ch, LANE)

    @property
    def ac(self):
        return _rup(self.alpha_cond_ch, LANE) if self.alpha_cond_ch else 0


def _layer_defs(spec: FusedMLPSpec):
    """Ordered (name, row_segments, out_pad) for every dense layer.

    row_segments is a list of (orig_rows, padded_rows) pairs describing how
    the original kernel's input rows map into the padded input layout.
    """
    s = spec
    bw_orig = s.trunk_width // 2
    defs = []
    # trunk hidden layers
    for i in range(s.trunk_depth):
        segs = [(s.in_ch, s.in_pad)] if i == 0 else [(s.trunk_width, s.tw)]
        if i > 0 and (i - 1) in s.skips:
            segs.append((s.in_ch, s.in_pad))
        defs.append((f'trunk_{i}', segs, s.tw))
    # trunk logit (relu output)
    segs = [(s.trunk_width, s.tw)]
    if (s.trunk_depth - 1) in s.skips:
        segs.append((s.in_ch, s.in_pad))
    defs.append(('trunk_logit', segs, s.tw))
    # bottleneck
    defs.append(('bottleneck', [(s.trunk_width, s.tw)], s.bw))
    # alpha head
    segs = [(bw_orig, s.bw)]
    if s.alpha_cond_ch:
        segs.append((s.alpha_cond_ch, s.ac))
    defs.append(('alpha_head', segs, HEAD_PAD))
    # rgb branch
    rin_segs = [(bw_orig, s.bw), (s.rgb_cond_ch, s.rc)]
    for j in range(s.rgb_depth):
        segs = list(rin_segs) if j == 0 else [(s.rgb_width, s.rw)]
        if j > 0 and (j - 1) in s.skips:
            segs.extend(rin_segs)
        defs.append((f'rgb_{j}', segs, s.rw))
    segs = [(s.rgb_width, s.rw)]
    if (s.rgb_depth - 1) in s.skips:
        segs.extend(rin_segs)
    defs.append(('rgb_logit', segs, HEAD_PAD))
    return defs


def nerf_mlp_params_to_list(params) -> list:
    """Flatten a NerfMLP param tree (models/modules.py) into the fused
    kernel's (W, b) list ordering."""
    out = []
    trunk = params['trunk']
    depth = len([k for k in trunk if k.startswith('hidden_')])
    for i in range(depth):
        out.append((trunk[f'hidden_{i}']['kernel'], trunk[f'hidden_{i}']['bias']))
    out.append((trunk['logit']['kernel'], trunk['logit']['bias']))
    out.append((params['bottleneck']['kernel'], params['bottleneck']['bias']))
    out.append((params['alpha_head']['kernel'], params['alpha_head']['bias']))
    rgb = params['rgb_branch']
    rgb_depth = len([k for k in rgb if k.startswith('hidden_')])
    for j in range(rgb_depth):
        out.append((rgb[f'hidden_{j}']['kernel'], rgb[f'hidden_{j}']['bias']))
    out.append((rgb['logit']['kernel'], rgb['logit']['bias']))
    return out


def list_to_nerf_mlp_params(pairs, template) -> dict:
    """Inverse of nerf_mlp_params_to_list, shaped like ``template``."""
    trunk = template['trunk']
    depth = len([k for k in trunk if k.startswith('hidden_')])
    rgb = template['rgb_branch']
    rgb_depth = len([k for k in rgb if k.startswith('hidden_')])
    it = iter(pairs)
    out = {'trunk': {}, 'rgb_branch': {}}
    for i in range(depth):
        w, b = next(it)
        out['trunk'][f'hidden_{i}'] = {'kernel': w, 'bias': b}
    w, b = next(it)
    out['trunk']['logit'] = {'kernel': w, 'bias': b}
    w, b = next(it)
    out['bottleneck'] = {'kernel': w, 'bias': b}
    w, b = next(it)
    out['alpha_head'] = {'kernel': w, 'bias': b}
    for j in range(rgb_depth):
        w, b = next(it)
        out['rgb_branch'][f'hidden_{j}'] = {'kernel': w, 'bias': b}
    w, b = next(it)
    out['rgb_branch']['logit'] = {'kernel': w, 'bias': b}
    return out


def _pad_weight(w, segs, out_pad, out_orig):
    """Pad kernel rows by segment layout and columns to out_pad (zeros)."""
    rows = []
    start = 0
    for orig, pad in segs:
        piece = w[start:start + orig]
        rows.append(jnp.pad(piece, ((0, pad - orig), (0, 0))))
        start += orig
    wp = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    return jnp.pad(wp, ((0, 0), (0, out_pad - out_orig)))


def _pad_params(spec: FusedMLPSpec, pairs):
    """Pad all (W, b) pairs to the kernel layout, cast to the compute dtype."""
    defs = _layer_defs(spec)
    assert len(defs) == len(pairs), (len(defs), len(pairs))
    dt = jnp.dtype(spec.compute_dtype)
    padded = []
    for (name, segs, out_pad), (w, b) in zip(defs, pairs):
        out_orig = w.shape[1]
        wp = _pad_weight(w, segs, out_pad, out_orig).astype(dt)
        bp = jnp.pad(b, (0, out_pad - out_orig)).astype(dt)[None, :]
        padded.append((wp, bp))
    return padded


def _dot(a, w):
    return jax.lax.dot_general(a, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_act(h, w, b, dt, relu: bool = True, epi_in_dt: bool = False):
    """Hidden layer: [relu](h @ w + b) rounded to the compute dtype.

    fp32 accumulation throughout: Mosaic requires a 32-bit matmul
    accumulator ('Expected matmul acc to be 32-bit' when asked for a bf16
    output), so by default the bias-add/relu run in fp32 and round once at
    the end — the same semantics the kernels always had.

    With ``epi_in_dt`` (spec.bf16_epilogue) the accumulator rounds to the
    compute dtype FIRST and bias+relu run there: relu commutes with
    round-to-nearest (sign-preserving), so the only numeric change is the
    bias add seeing a pre-rounded activation — and none at all when the
    compute dtype is float32.
    """
    out = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if epi_in_dt:
        out = out.astype(dt) + b.astype(dt)
        if relu:
            out = jnp.maximum(out, jnp.zeros((), dt))
        return out
    out = out + b.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(dt)


def _dot_t(g, w):
    """g @ w^T via contraction on the output dim."""
    return jax.lax.dot_general(g, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_acc(h, g):
    """h^T @ g (weight gradient) in fp32."""
    return jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _expand_rays(cond, n_points: int):
    """(R, C) per-ray rows -> (n_points, C), each repeated n_points/R times.

    Broadcast along a fresh sample axis + sublane-collapsing reshape: a pure
    VPU copy in Mosaic (~10x cheaper per tile than the one-hot MXU matmul it
    replaced, and exact for every dtype).
    """
    r, c = cond.shape
    s = n_points // r
    return jnp.broadcast_to(cond[:, None, :], (r, s, c)).reshape(n_points, c)


def _reduce_rays(g, n_rays: int):
    """(T, C) per-point cotangents -> (n_rays, C) fp32, summed per ray.

    Sublane-splitting reshape + sum over the sample axis (exactly XLA's own
    reshape-sum reduction tree).
    """
    t, c = g.shape
    return jnp.sum(g.astype(jnp.float32).reshape(n_rays, t // n_rays, c),
                   axis=1)


def cond_tile_rows(spec) -> int:
    """Per-ray rows covered by one grid step (cond_samples mode)."""
    assert spec.tile % spec.cond_samples == 0, (spec.tile, spec.cond_samples)
    return spec.tile // spec.cond_samples


def cond_to_tiles(a, n_tiles: int):
    """(R, C) per-ray rows -> (n_tiles, R/n_tiles, C).

    Mosaic requires the last two block dims to be (8, 128)-aligned OR equal
    to the array dims; a tile can cover fewer than 8 rays (e.g. 512-point
    tiles at 128 samples/ray), so per-ray buffers are shipped 3-D with one
    leading tile axis and a full-block (1, rows, C) spec. Row-major reshape:
    free.
    """
    return a.reshape(n_tiles, a.shape[0] // n_tiles, a.shape[1])


def cond_spec3(rows: int, width: int):
    return pl.BlockSpec((1, rows, width), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _forward_tile_gen(spec: FusedMLPSpec, x, rgbc, alphac, wbs,
                      enc_scales=None):
    """Generator form of _forward_tile: yields at op-group boundaries so
    pipelined kernels can interleave this stream with an independent tile
    (common.interleave)."""
    s = spec
    bf = jnp.dtype(s.compute_dtype)
    idx = 0
    stash = {'trunk_ins': [], 'trunk_outs': [], 'rgb_ins': [], 'rgb_outs': []}

    if s.enc_segments:
        from hypernerf_tpu.ops.pallas.fused_field import FusedFieldSpec as _FS
        from hypernerf_tpu.ops.pallas.fused_field import _encode_gen
        fs = _FS(segments=s.enc_segments, compute_dtype=s.compute_dtype)
        assert fs.enc_ch == s.in_ch, (fs.enc_ch, s.in_ch)
        x, stash['x_trig'] = yield from _encode_gen(fs, x, enc_scales,
                                                    return_trig=True)
        # _encode pads to fs.enc_pad == rup(in_ch, 128) == s.in_pad.
        stash['x_enc'] = x
        yield
    h = x
    for i in range(s.trunk_depth):
        w, b = wbs[idx]; idx += 1
        stash['trunk_ins'].append(h)
        h = _dot_act(h, w, b, bf, epi_in_dt=s.bf16_epilogue)
        yield
        stash['trunk_outs'].append(h)
        if i in s.skips:
            h = jnp.concatenate([h, x], axis=-1)
    w, b = wbs[idx]; idx += 1
    stash['tl_in'] = h
    hl = _dot_act(h, w, b, bf, epi_in_dt=s.bf16_epilogue)
    yield
    stash['hl'] = hl
    w, b = wbs[idx]; idx += 1
    bneck = _dot_act(hl, w, b, bf, relu=False,
                     epi_in_dt=s.bf16_epilogue)
    yield
    stash['bneck'] = bneck

    a_in = bneck if alphac is None else jnp.concatenate([bneck, alphac], -1)
    stash['a_in'] = a_in
    w, b = wbs[idx]; idx += 1
    alpha = _dot(a_in, w) + b.astype(jnp.float32)  # (T, HEAD_PAD) fp32
    yield

    r_in = jnp.concatenate([bneck, rgbc], axis=-1)
    stash['r_in'] = r_in
    g = r_in
    for j in range(s.rgb_depth):
        w, b = wbs[idx]; idx += 1
        stash['rgb_ins'].append(g)
        g = _dot_act(g, w, b, bf, epi_in_dt=s.bf16_epilogue)
        yield
        stash['rgb_outs'].append(g)
        if j in s.skips:
            g = jnp.concatenate([g, r_in], axis=-1)
    w, b = wbs[idx]; idx += 1
    stash['rl_in'] = g
    rgb = _dot(g, w) + b.astype(jnp.float32)  # (T, HEAD_PAD) fp32
    return rgb, alpha, stash


def _forward_tile(spec: FusedMLPSpec, x, rgbc, alphac, wbs,
                  enc_scales=None):
    """Shared forward over one tile; returns (rgb, alpha, stash).

    x: (T, in_pad) bf16; rgbc: (T, rc) bf16; alphac: (T, ac) bf16 or None.
    enc_scales: optional (1, in_pad) fp32 window row for the in-kernel
    encoding. stash holds per-layer (input, post-relu output) for the
    backward.
    """
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_forward_tile_gen(spec, x, rgbc, alphac, wbs, enc_scales))


def _make_fwd_kernel(spec: FusedMLPSpec, n_layers: int, has_ac: bool):
    def kernel(*refs):
        x_ref, rgbc_ref = refs[0], refs[1]
        off = 2
        alphac_ref = refs[off] if has_ac else None
        off += 1 if has_ac else 0
        scales = refs[off][:] if spec.windowed else None
        off += 1 if spec.windowed else 0
        wbs = [(refs[off + 2 * k][:], refs[off + 2 * k + 1][:])
               for k in range(n_layers)]
        out_ref = refs[off + 2 * n_layers]
        x = x_ref[:]
        if spec.cond_samples:
            rgbc = _expand_rays(rgbc_ref[0], x.shape[0])
            alphac = (_expand_rays(alphac_ref[0], x.shape[0])
                      if has_ac else None)
        else:
            rgbc = rgbc_ref[:]
            alphac = alphac_ref[:] if has_ac else None
        rgb, alpha, _ = _forward_tile(spec, x, rgbc, alphac, wbs,
                                      enc_scales=scales)
        out = jnp.concatenate(
            [rgb[:, :spec.rgb_channels],
             alpha[:, :spec.alpha_channels],
             jnp.zeros((rgb.shape[0],
                        8 - spec.rgb_channels - spec.alpha_channels),
                       jnp.float32)], axis=-1)
        out_ref[:] = out
    return kernel


def _backward_tile_gen(spec: FusedMLPSpec, x, rgbc, alphac, g_all, wbs,
                       enc_scales=None):
    """Generator form of _backward_tile (yields at op-group boundaries)."""
    s = spec
    bf = jnp.dtype(s.compute_dtype)
    n_layers = len(wbs)
    _, _, st = yield from _forward_tile_gen(s, x, rgbc, alphac, wbs,
                                            enc_scales=enc_scales)
    t = g_all.shape[0]
    grads = [None] * n_layers

    def acc(k, dw, db):
        grads[k] = (dw, db)

    g_rgb = jnp.concatenate(
        [g_all[:, :s.rgb_channels],
         jnp.zeros((t, HEAD_PAD - s.rgb_channels), jnp.float32)], -1)
    g_alpha = jnp.concatenate(
        [g_all[:, s.rgb_channels:s.rgb_channels + s.alpha_channels],
         jnp.zeros((t, HEAD_PAD - s.alpha_channels), jnp.float32)], -1)

    # --- rgb logit ---
    k = n_layers - 1
    g_rgb_b = g_rgb.astype(bf)
    acc(k, _dot_acc(st['rl_in'], g_rgb_b),
        jnp.sum(g_rgb, axis=0, keepdims=True))
    gg = _dot_t(g_rgb_b, wbs[k][0]).astype(bf)
    yield

    rin_w = s.bw + s.rc
    g_rin_acc = jnp.zeros((t, rin_w), jnp.float32)
    if (s.rgb_depth - 1) in s.skips:
        g_rin_acc += gg[:, s.rw:].astype(jnp.float32)
        gg = gg[:, :s.rw]
    # --- rgb hidden layers ---
    for j in range(s.rgb_depth - 1, -1, -1):
        k = n_layers - 1 - (s.rgb_depth - j)
        gg = jnp.where(st['rgb_outs'][j].astype(jnp.float32) > 0,
                       gg, 0).astype(bf)
        acc(k, _dot_acc(st['rgb_ins'][j], gg),
            jnp.sum(gg.astype(jnp.float32), axis=0, keepdims=True))
        yield
        gg = _dot_t(gg, wbs[k][0]).astype(bf)
        yield
        if j > 0 and (j - 1) in s.skips:
            g_rin_acc += gg[:, s.rw:].astype(jnp.float32)
            gg = gg[:, :s.rw]
    g_rin_acc += gg.astype(jnp.float32)  # (T, bw + rc)

    g_b = g_rin_acc[:, :s.bw]
    drgbc = g_rin_acc[:, s.bw:]

    # --- alpha head ---
    k_alpha = s.trunk_depth + 2
    g_alpha_b = g_alpha.astype(bf)
    acc(k_alpha, _dot_acc(st['a_in'], g_alpha_b),
        jnp.sum(g_alpha, axis=0, keepdims=True))
    ga = _dot_t(g_alpha_b, wbs[k_alpha][0]).astype(jnp.float32)
    g_b = g_b + ga[:, :s.bw]
    dalphac = ga[:, s.bw:] if alphac is not None else None
    yield

    # --- bottleneck ---
    k_bn = s.trunk_depth + 1
    g_b_bf = g_b.astype(bf)
    acc(k_bn, _dot_acc(st['hl'], g_b_bf),
        jnp.sum(g_b, axis=0, keepdims=True))
    g_hl = _dot_t(g_b_bf, wbs[k_bn][0]).astype(jnp.float32)
    yield

    # --- trunk logit (relu) ---
    k_tl = s.trunk_depth
    g_hl = jnp.where(st['hl'].astype(jnp.float32) > 0, g_hl, 0).astype(bf)
    acc(k_tl, _dot_acc(st['tl_in'], g_hl),
        jnp.sum(g_hl.astype(jnp.float32), axis=0, keepdims=True))
    yield
    gh = _dot_t(g_hl, wbs[k_tl][0]).astype(bf)
    yield

    g_x_acc = jnp.zeros((t, s.in_pad), jnp.float32)
    if (s.trunk_depth - 1) in s.skips:
        g_x_acc += gh[:, s.tw:].astype(jnp.float32)
        gh = gh[:, :s.tw]
    # --- trunk hidden layers ---
    for i in range(s.trunk_depth - 1, -1, -1):
        gh = jnp.where(st['trunk_outs'][i].astype(jnp.float32) > 0,
                       gh, 0).astype(bf)
        acc(i, _dot_acc(st['trunk_ins'][i], gh),
            jnp.sum(gh.astype(jnp.float32), axis=0, keepdims=True))
        yield
        gh = _dot_t(gh, wbs[i][0]).astype(bf)
        yield
        if i > 0 and (i - 1) in s.skips:
            g_x_acc += gh[:, s.tw:].astype(jnp.float32)
            gh = gh[:, :s.tw]
    g_x_acc += gh.astype(jnp.float32)
    if s.enc_segments:
        from hypernerf_tpu.ops.pallas.fused_field import (
            FusedFieldSpec as _FS, _encode_bwd_gen)
        from hypernerf_tpu.ops.pallas.fused_field import norm_seg as _ns
        fs = _FS(segments=s.enc_segments, compute_dtype=s.compute_dtype)
        raw_ch = sum(_ns(seg)[0] for seg in s.enc_segments)
        # Reuse the recompute's fp32 band sin/cos — bit-identical VJP
        # without a second transcendental pass.
        dx = yield from _encode_bwd_gen(fs, x[:, :raw_ch], g_x_acc,
                                        enc_scales, trig=st['x_trig'])
    else:
        dx = g_x_acc
    return dx, drgbc, dalphac, grads


def _backward_tile(spec: FusedMLPSpec, x, rgbc, alphac, g_all, wbs,
                   enc_scales=None):
    """Recompute + backprop one tile (pure values, reusable by fused_level).

    Args:
      x: (T, in_pad|raw) input as given to the forward; rgbc/alphac padded
        condition tiles; g_all: (T, 8) packed [g_rgb | g_alpha | 0] fp32.

    Returns (dx, drgbc, dalphac, grads) where dx is (T, raw_ch) when
    enc_segments is set else (T, in_pad), and grads is [(dW, db)] fp32.
    """
    from hypernerf_tpu.ops.pallas.common import drive
    return drive(_backward_tile_gen(spec, x, rgbc, alphac, g_all, wbs,
                                    enc_scales))


def _make_bwd_kernel(spec: FusedMLPSpec, n_layers: int, has_ac: bool):
    s = spec

    def kernel(*refs):
        x_ref, rgbc_ref = refs[0], refs[1]
        off = 2
        alphac_ref = refs[off] if has_ac else None
        off += 1 if has_ac else 0
        scales = refs[off][:] if s.windowed else None
        off += 1 if s.windowed else 0
        g_ref = refs[off]; off += 1
        wb_refs = refs[off:off + 2 * n_layers]
        wbs = [(wb_refs[2 * k][:], wb_refs[2 * k + 1][:])
               for k in range(n_layers)]
        out_off = off + 2 * n_layers
        dx_ref = refs[out_off]
        drgbc_ref = refs[out_off + 1]
        o = out_off + 2
        dalphac_ref = refs[o] if has_ac else None
        o += 1 if has_ac else 0
        dwb_refs = refs[o:o + 2 * n_layers]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in dwb_refs:
                r[:] = jnp.zeros(r.shape, r.dtype)

        x = x_ref[:]
        if s.cond_samples:
            rgbc = _expand_rays(rgbc_ref[0], x.shape[0])
            alphac = (_expand_rays(alphac_ref[0], x.shape[0])
                      if has_ac else None)
        else:
            rgbc = rgbc_ref[:]
            alphac = alphac_ref[:] if has_ac else None
        dx, drgbc, dalphac, grads = _backward_tile(
            s, x, rgbc, alphac, g_ref[:], wbs, enc_scales=scales)
        pad = dx_ref.shape[1] - dx.shape[1]
        if pad:
            dx = jnp.concatenate(
                [dx, jnp.zeros((dx.shape[0], pad), jnp.float32)], -1)
        dx_ref[:] = dx.astype(dx_ref.dtype)
        if s.cond_samples:
            drgbc_ref[0] = _reduce_rays(
                drgbc, drgbc_ref.shape[1]).astype(drgbc_ref.dtype)
            if has_ac:
                dalphac_ref[0] = _reduce_rays(
                    dalphac, dalphac_ref.shape[1]).astype(dalphac_ref.dtype)
        else:
            drgbc_ref[:] = drgbc.astype(drgbc_ref.dtype)
            if has_ac:
                dalphac_ref[:] = dalphac.astype(dalphac_ref.dtype)
        for k, (dw, db) in enumerate(grads):
            dwb_refs[2 * k][:] += dw
            dwb_refs[2 * k + 1][:] += db
    return kernel


def _fwd_call(spec: FusedMLPSpec, x_pad, rgbc_pad, alphac_pad, padded_wbs,
              enc_scales=None):
    s = spec
    p = x_pad.shape[0]
    n_tiles = p // s.tile
    n_layers = len(padded_wbs)
    has_ac = alphac_pad is not None

    if s.cond_samples:
        rows = cond_tile_rows(s)
        rgbc_in = cond_to_tiles(rgbc_pad, n_tiles)
        rgbc_spec = cond_spec3(rows, rgbc_pad.shape[1])
        if has_ac:
            alphac_in = cond_to_tiles(alphac_pad, n_tiles)
            alphac_spec = cond_spec3(rows, alphac_pad.shape[1])
    else:
        rgbc_in = rgbc_pad
        rgbc_spec = pl.BlockSpec((s.tile, rgbc_pad.shape[1]),
                                 lambda i: (i, 0), memory_space=pltpu.VMEM)
        if has_ac:
            alphac_in = alphac_pad
            alphac_spec = pl.BlockSpec((s.tile, alphac_pad.shape[1]),
                                       lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    data_in = ([x_pad, rgbc_in] + ([alphac_in] if has_ac else [])
               + ([enc_scales] if s.windowed else []))
    data_specs = [
        pl.BlockSpec((s.tile, x_pad.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        rgbc_spec,
    ]
    if has_ac:
        data_specs.append(alphac_spec)
    if s.windowed:
        data_specs.append(pl.BlockSpec((1, enc_scales.shape[1]),
                                       lambda i: (0, 0),
                                       memory_space=pltpu.VMEM))
    w_in, w_specs = [], []
    for w, b in padded_wbs:
        w_in += [w, b]
        w_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        _make_fwd_kernel(s, n_layers, has_ac),
        grid=(n_tiles,),
        in_specs=data_specs + w_specs,
        out_specs=pl.BlockSpec((s.tile, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, 8), jnp.float32),
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(*data_in, *w_in)
    return out


def _bwd_call(spec: FusedMLPSpec, x_pad, rgbc_pad, alphac_pad, padded_wbs, g,
              enc_scales=None):
    s = spec._replace(tile=spec.bwd_tile or spec.tile)
    p = x_pad.shape[0]
    n_tiles = p // s.tile
    n_layers = len(padded_wbs)
    has_ac = alphac_pad is not None

    if s.cond_samples:
        rows = cond_tile_rows(s)
        rgbc_in = cond_to_tiles(rgbc_pad, n_tiles)
        rgbc_spec = cond_spec3(rows, rgbc_pad.shape[1])
        if has_ac:
            alphac_in = cond_to_tiles(alphac_pad, n_tiles)
            alphac_spec = cond_spec3(rows, alphac_pad.shape[1])
    else:
        rgbc_in = rgbc_pad
        rgbc_spec = pl.BlockSpec((s.tile, rgbc_pad.shape[1]),
                                 lambda i: (i, 0), memory_space=pltpu.VMEM)
        if has_ac:
            alphac_in = alphac_pad
            alphac_spec = pl.BlockSpec((s.tile, alphac_pad.shape[1]),
                                       lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
    data_in = ([x_pad, rgbc_in] + ([alphac_in] if has_ac else [])
               + ([enc_scales] if s.windowed else []) + [g])
    data_specs = [
        pl.BlockSpec((s.tile, x_pad.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        rgbc_spec,
    ]
    if has_ac:
        data_specs.append(alphac_spec)
    if s.windowed:
        data_specs.append(pl.BlockSpec((1, enc_scales.shape[1]),
                                       lambda i: (0, 0),
                                       memory_space=pltpu.VMEM))
    data_specs.append(pl.BlockSpec((s.tile, 8), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM))
    w_in, w_specs = [], []
    for w, b in padded_wbs:
        w_in += [w, b]
        w_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    out_shapes = [
        jax.ShapeDtypeStruct((p, x_pad.shape[1]), jnp.float32),   # dx
        jax.ShapeDtypeStruct(rgbc_in.shape, jnp.float32),         # drgbc
    ]
    out_specs = [
        pl.BlockSpec((s.tile, x_pad.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        rgbc_spec,
    ]
    if has_ac:
        out_shapes.append(jax.ShapeDtypeStruct(alphac_in.shape, jnp.float32))
        out_specs.append(alphac_spec)
    for w, b in padded_wbs:
        out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32),
                       jax.ShapeDtypeStruct(b.shape, jnp.float32)]
        out_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    outs = pl.pallas_call(
        _make_bwd_kernel(s, n_layers, has_ac),
        grid=(n_tiles,),
        in_specs=data_specs + w_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=s.interpret,
        compiler_params=vmem_params(s.interpret),
    )(*data_in, *w_in)
    if s.cond_samples:
        # Un-tile the per-ray cond grads back to (R, C).
        outs = list(outs)
        outs[1] = outs[1].reshape(rgbc_pad.shape)
        if has_ac:
            outs[2] = outs[2].reshape(alphac_pad.shape)
        outs = tuple(outs)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(spec, x_pad, rgbc_pad, alphac_pad, enc_scales, padded_flat):
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    return _fwd_call(spec, x_pad, rgbc_pad, alphac_pad, padded_wbs,
                     enc_scales)


def _fused_fwd(spec, x_pad, rgbc_pad, alphac_pad, enc_scales, padded_flat):
    return (_fused(spec, x_pad, rgbc_pad, alphac_pad, enc_scales,
                   padded_flat),
            (x_pad, rgbc_pad, alphac_pad, enc_scales, padded_flat))


def _fused_bwd(spec, res, g):
    x_pad, rgbc_pad, alphac_pad, enc_scales, padded_flat = res
    padded_wbs = [(padded_flat[2 * k], padded_flat[2 * k + 1])
                  for k in range(len(padded_flat) // 2)]
    outs = _bwd_call(spec, x_pad, rgbc_pad, alphac_pad, padded_wbs, g,
                     enc_scales)
    has_ac = alphac_pad is not None
    dx = outs[0].astype(x_pad.dtype)
    drgbc = outs[1].astype(rgbc_pad.dtype)
    o = 2
    dalphac = outs[o].astype(alphac_pad.dtype) if has_ac else None
    o += 1 if has_ac else 0
    dflat = tuple(outs[o + k].astype(padded_flat[k].dtype)
                  for k in range(len(padded_flat)))
    d_scales = None if enc_scales is None else jnp.zeros_like(enc_scales)
    return dx, drgbc, dalphac, d_scales, dflat


_fused.defvjp(_fused_fwd, _fused_bwd)


def _unpad_weight_grad(dwp, segs, out_orig):
    """Extract the original-rows/cols gradient from a padded dW."""
    rows = []
    start = 0
    for orig, pad in segs:
        rows.append(dwp[start:start + orig])
        start += pad
    dw = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    return dw[:, :out_orig]


def fused_nerf_mlp(spec: FusedMLPSpec, x, rgb_cond, alpha_cond, pairs,
                   enc_scales=None):
    """Fused template evaluation.

    Args:
      spec: static FusedMLPSpec (in_ch, depths, widths, cond dims, tile).
      x: (P, in_ch) encoded sample features (any float dtype).
      rgb_cond: (P, rgb_cond_ch) per-sample rgb condition features — or,
        when spec.cond_samples = S > 0, (P // S, rgb_cond_ch) PER-RAY rows
        (each ray covering S consecutive sample points; expanded in-kernel).
      alpha_cond: (P|P//S, alpha_cond_ch) or None.
      pairs: list of (W, b) in nerf_mlp_params_to_list order (unpadded fp32).
      enc_scales: (1, in_pad) annealing-window row (requires spec.windowed
        and enc_segments; build with fused_field.encoding_scales).

    Returns:
      {'rgb': (P, rgb_channels), 'alpha': (P, alpha_channels)} raw fp32
      outputs (activations applied by the caller, matching NerfMLP).
    """
    s = spec
    assert (enc_scales is not None) == s.windowed
    p = x.shape[0]
    import math as _math
    granularity = _math.lcm(s.tile, s.bwd_tile or s.tile)
    if s.cond_samples:
        assert p % s.cond_samples == 0, (p, s.cond_samples)
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
    if s.enc_segments:
        from hypernerf_tpu.ops.pallas.fused_field import norm_seg as _ns
        raw_ch = sum(_ns(seg)[0] for seg in s.enc_segments)
        assert x.shape[1] == raw_ch, (x.shape, raw_ch)
        # Raw points stay fp32 (posenc needs the precision).
        x_pad = pad_rows(jnp.pad(x.astype(jnp.float32),
                                 ((0, 0), (0, raw_pad_for(raw_ch) - raw_ch))))
    else:
        x_pad = pad_rows(jnp.pad(x.astype(dt),
                                 ((0, 0), (0, s.in_pad - s.in_ch))))
    rgbc_pad = pad_cond_rows(jnp.pad(rgb_cond.astype(dt),
                                     ((0, 0), (0, s.rc - s.rgb_cond_ch))))
    if s.alpha_cond_ch:
        alphac_pad = pad_cond_rows(
            jnp.pad(alpha_cond.astype(dt),
                    ((0, 0), (0, s.ac - s.alpha_cond_ch))))
    else:
        alphac_pad = None

    padded = _pad_params(s, pairs)
    padded_flat = tuple(a for wb in padded for a in wb)
    out = _fused(s, x_pad, rgbc_pad, alphac_pad, enc_scales, padded_flat)
    out = out[:p]
    return {'rgb': out[:, :s.rgb_channels],
            'alpha': out[:, s.rgb_channels:s.rgb_channels + s.alpha_channels]}
