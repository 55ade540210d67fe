"""Fused activation + volume-rendering kernel (ray-major, custom VJP).

Consumes the fused level kernel's packed (P, 8) [rgb_logits | raw_sigma]
output directly and produces per-ray rgb/depth/med_depth/acc plus per-sample
weights — sigmoid, softplus, sigma noise add, deltas, transmittance cumprod,
and every compositing reduction run in VMEM over (rays, samples) tiles.

Replaces ~13 ms/step of XLA glue in the train step: the (B, S, 3)
compositing ops run at 3/128 lane utilization and the packed->sliced->
packed cotangent plumbing costs several (P, 8) HBM round trips
(BENCHMARKS.md). Semantics match ops/rendering.volumetric_rendering +
nn.sigmoid/nn.softplus exactly (same eps/infinity-sample/acc rules, which
themselves mirror /root/reference/hypernerf/model_utils.py:43-107); the
backward recomputes the forward per tile and applies the analytic cumprod
VJP (reverse cumulative sums).

The per-lane cumulative ops use log-depth shift scans (pltpu.roll + masked
select) — S is 64/128 lanes, so 6-7 VPU passes each.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hypernerf_tpu.ops.pallas.common import vmem_params

OUT_PAD = 8  # per-ray packed outputs [rgb(3) | depth | med | acc | 0 0]


def _rup(x, m):
    return ((x + m - 1) // m) * m


def _next_pow2(x):
    p = 1
    while p < x:
        p *= 2
    return p


# Far-beyond-any-depth sentinel for the union-merge padding lanes. NOT
# jnp.inf: the in-kernel lane reverse is an anti-diagonal MATMUL
# (_reverse_lanes) and inf * 0.0 = NaN would poison the permutation.
_Z_SENTINEL = 1e10


class CompositeSpec(NamedTuple):
    """Static config (hashable)."""
    samples: int
    rays_per_tile: int = 256
    use_white_background: bool = False
    sample_at_infinity: bool = True
    has_noise: bool = False
    eps: float = 1e-5
    interpret: bool = False
    # When > 0 the coarse-level call ALSO draws the fine z's in-kernel:
    # inverse-CDF over its own weights (ops/sampling.piecewise_constant_pdf
    # semantics) + bitonic union-merge with the coarse z — the hierarchical
    # sample_pdf (model_utils.py:206-232) without leaving VMEM. Requires
    # sorted u (ops/sampling.sorted_uniform). A non-power-of-two total
    # (e.g. the reference-default 64+128, opt.py:23) is handled by padding
    # the merge with _Z_SENTINEL lanes up to the next power of two inside
    # the kernel and slicing them off outside — the fine level still sees
    # exactly samples + fine_samples depths. The union depths are
    # gradient-dead (fine samples detached per the reference's
    # model_utils.py:204; coarse depths parameter-free), so the backward
    # ignores their cotangent.
    fine_samples: int = 0

    @property
    def union_width(self) -> int:
        """In-kernel merge width: samples + fine_samples rounded up to a
        power of two (the bitonic network's requirement)."""
        return _next_pow2(self.samples + self.fine_samples)


def _shift_scan(x, op, identity):
    """Inclusive scan along the last axis via log-depth masked shifts."""
    s = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = 1
    while k < s:
        shifted = jnp.where(col >= k, pltpu.roll(x, k, axis=x.ndim - 1),
                            identity)
        x = op(x, shifted)
        k *= 2
    return x


def _shift_right(x, fill):
    """x[..., s] -> x[..., s-1], first lane = fill."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(col >= 1, pltpu.roll(x, 1, axis=x.ndim - 1), fill)


def _rev_cumsum(x):
    """Σ_{t>=s} x_t along the last axis (reverse inclusive cumsum).

    pltpu.roll only takes non-negative shifts; a left-roll by k is the
    circular right-roll by s-k.
    """
    s = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = 1
    while k < s:
        shifted = jnp.where(col < s - k,
                            pltpu.roll(x, s - k, axis=x.ndim - 1), 0.0)
        x = x + shifted
        k *= 2
    return x


def _select_matrix(samples: int):
    """(S*8, 4*S) selection: column c*S + s picks packed lane s*8 + c.

    One exact fp32 MXU matmul de-interleaves the packed row layout into
    four contiguous (R, S) channel planes. Built from iota (kernels cannot
    capture array constants); a (R, S, 8) reshape would either be an
    unsupported lane-splitting shape cast or pad the 8-lane minor dim to
    128 (16x VMEM).
    """
    s = samples
    rows = jax.lax.broadcasted_iota(jnp.int32, (s * 8, 4 * s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s * 8, 4 * s), 1)
    want = (cols % s) * 8 + cols // s
    return jnp.where(rows == want, 1.0, 0.0)


def _unpack(spec: CompositeSpec, packed):
    """(R, S*8) packed rows -> four (R, S) channel planes (exact)."""
    s = spec.samples
    planes = jax.lax.dot_general(
        packed, _select_matrix(s), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return tuple(planes[:, c * s:(c + 1) * s] for c in range(4))


def _repack(spec: CompositeSpec, planes):
    """Four (R, S) channel planes -> (R, S*8) packed rows (exact)."""
    s = spec.samples
    d4 = jnp.concatenate(planes, axis=-1)           # (R, 4*S)
    return jax.lax.dot_general(
        d4, _select_matrix(s), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _reverse_lanes(x):
    """Reverse the last axis via an exact anti-diagonal f32 matmul (no
    lane-splitting reshapes; permutation matmuls are exact)."""
    n = x.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    rev = jnp.where(rows + cols == n - 1, 1.0, 0.0)
    return jax.lax.dot_general(x, rev, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _bitonic_merge(x):
    """Ascending sort of a bitonic row (asc-then-desc), last axis = 2^k.

    log2(U) compare-exchange stages of roll + select — sorting is pure
    selection, so the result is bit-identical to jnp.sort of the same
    multiset.
    """
    u = x.shape[-1]
    assert u & (u - 1) == 0, u
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = u // 2
    while k >= 1:
        fwd = pltpu.roll(x, u - k, axis=x.ndim - 1)   # x[i + k] at lane i
        bwd = pltpu.roll(x, k, axis=x.ndim - 1)       # x[i - k] at lane i
        first = (col % (2 * k)) < k
        x = jnp.where(first, jnp.minimum(x, fwd), jnp.maximum(x, bwd))
        k //= 2
    return x


def _fine_z_tile(spec: CompositeSpec, weights, z, u, col):
    """In-kernel hierarchical sampling: (R, S + N) sorted union depths.

    Mirrors ops/sampling.sample_pdf composed with the model's call
    (models.py:753 semantics): bins = z midpoints, weights[1:-1] + eps, CDF
    inversion via the same masked max/min formulation as
    ops/sampling.piecewise_constant_pdf, then a sorted-merge with the
    coarse z. ``u`` must be ascending per ray (sorted_uniform /
    linspace) so the inverse-CDF output is sorted by construction and the
    union is a bitonic merge.
    """
    sp = spec
    s, n = sp.samples, sp.fine_samples
    eps = 1e-5
    z_next = pltpu.roll(z, s - 1, axis=1)             # z[k+1] at lane k
    bins = 0.5 * (z + z_next)                         # lanes 0..s-2 valid
    w = jnp.where((col >= 1) & (col <= s - 2), weights + eps, 0.0)
    pdf = w / jnp.sum(w, axis=1, keepdims=True)
    cdf = _shift_scan(pdf, jnp.add, 0.0)              # cdf_k at lane k, 0..s-2

    # Masked max/min bracket (exactly ops/sampling.piecewise_constant_pdf's
    # formulation): mask[r, k, j] = cdf_k <= u_j over the s-1 cdf entries.
    # Fill values enter as (R, 1, N) rows — Mosaic's gather lowering rejects
    # (R, 1, 1) operands broadcast into 3-D wheres.
    ones_u = jnp.ones_like(u)

    def fill(x_col):
        return (x_col * ones_u)[:, None, :]

    cdf3 = cdf[:, :, None]
    bins3 = bins[:, :, None]
    u3 = u[:, None, :]
    krow = jax.lax.broadcasted_iota(jnp.int32, (z.shape[0], s, n), 1)
    valid = krow <= s - 2
    mask = (u3 >= cdf3) & valid
    cdf_g0 = jnp.max(jnp.where(mask, cdf3, fill(cdf[:, :1])), axis=1)
    bins_g0 = jnp.max(jnp.where(mask, bins3, fill(bins[:, :1])), axis=1)
    cdf_g1 = jnp.min(jnp.where(mask | ~valid, fill(cdf[:, s - 2:s - 1]),
                               cdf3), axis=1)
    bins_g1 = jnp.min(jnp.where(mask | ~valid, fill(bins[:, s - 2:s - 1]),
                                bins3), axis=1)
    cdf_g0 = jnp.minimum(cdf_g0, cdf[:, s - 3:s - 2])
    bins_g0 = jnp.minimum(bins_g0, bins[:, s - 3:s - 2])
    cdf_g1 = jnp.maximum(cdf_g1, cdf[:, 1:2])
    bins_g1 = jnp.maximum(bins_g1, bins[:, 1:2])

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < eps, 1.0, denom)
    samples = bins_g0 + (u - cdf_g0) / denom * (bins_g1 - bins_g0)

    pad = sp.union_width - (s + n)
    if pad:
        # Ascending sentinel tail; after the reverse it becomes the peak
        # plateau of the bitonic sequence [z asc | sentinels | fine desc],
        # sorts to the top lanes, and is sliced off outside the kernel.
        samples = jnp.concatenate(
            [samples, jnp.full((samples.shape[0], pad), _Z_SENTINEL,
                               samples.dtype)], axis=-1)
    cat = jnp.concatenate([z, _reverse_lanes(samples)], axis=-1)
    return _bitonic_merge(cat)


def _forward_tile(spec: CompositeSpec, packed, z, dnorm, noise):
    """Compositing forward on one tile; returns intermediates for reuse.

    packed (R, S*8) f32 rows; z (R, S); dnorm (R, 1); noise (R, S) or None.
    """
    sp = spec
    r_l, g_l, b_l, a_raw = _unpack(sp, packed)
    if noise is not None:
        a_raw = a_raw + noise
    sigma = jax.nn.softplus(a_raw)
    rgb = [jax.nn.sigmoid(c) for c in (r_l, g_l, b_l)]

    last_z = 1e7 if sp.sample_at_infinity else 1e-7
    s = sp.samples
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    z_next = pltpu.roll(z, s - 1, axis=1)  # z[s+1] (left-roll by 1)
    dists_raw = jnp.where(col < s - 1, z_next - z, last_z)
    dists = dists_raw * dnorm

    alpha = 1.0 - jnp.exp(-sigma * dists)
    u = 1.0 - alpha + sp.eps
    cp = _shift_scan(u, jnp.multiply, 1.0)          # inclusive cumprod
    trans = _shift_right(cp, 1.0)                   # exclusive
    weights = alpha * trans
    return (a_raw, sigma, rgb, dists_raw, dists, alpha, u, trans, weights,
            col)


def _outputs_tile(spec: CompositeSpec, fwd, z):
    sp = spec
    _, _, rgb, _, _, _, _, _, weights, col = fwd
    out_c = [jnp.sum(weights * c, axis=1, keepdims=True) for c in rgb]
    depth = jnp.sum(weights * z, axis=1, keepdims=True)
    cum = _shift_scan(weights, jnp.add, 0.0)
    m = cum >= 0.5
    prev = jnp.logical_and(_shift_right(cum, 0.0) >= 0.5, col >= 1)
    mask = jnp.logical_and(m, jnp.logical_not(prev)).astype(z.dtype)
    med = jnp.sum(mask * z, axis=1, keepdims=True)
    acc_full = jnp.sum(weights, axis=1, keepdims=True)
    if sp.use_white_background:
        out_c = [c + (1.0 - acc_full) for c in out_c]
    if sp.sample_at_infinity:
        acc = jnp.sum(jnp.where(col < sp.samples - 1, weights, 0.0),
                      axis=1, keepdims=True)
    else:
        acc = acc_full
    r = weights.shape[0]
    outs = jnp.concatenate(
        out_c + [depth, med, acc, jnp.zeros((r, OUT_PAD - 6), z.dtype)],
        axis=-1)
    return outs, weights, mask


def _make_fwd_kernel(spec: CompositeSpec):
    sp = spec

    def kernel(*refs):
        packed_ref, z_ref, dnorm_ref = refs[0], refs[1], refs[2]
        off = 3
        noise_ref = refs[off] if sp.has_noise else None
        off += 1 if sp.has_noise else 0
        u_ref = refs[off] if sp.fine_samples else None
        off += 1 if sp.fine_samples else 0
        outs_ref, w_ref = refs[off], refs[off + 1]
        zu_ref = refs[off + 2] if sp.fine_samples else None
        z = z_ref[0]
        noise = noise_ref[0] if sp.has_noise else None
        fwd = _forward_tile(sp, packed_ref[0], z, dnorm_ref[0], noise)
        outs, weights, _ = _outputs_tile(sp, fwd, z)
        outs_ref[0] = outs
        w_ref[0] = weights
        if sp.fine_samples:
            zu_ref[0] = _fine_z_tile(sp, weights, z, u_ref[0], fwd[-1])
    return kernel


def _backward_tile(spec: CompositeSpec, packed, z, dnorm, noise,
                   d_outs, d_weights):
    """Analytic VJP of (_forward_tile -> _outputs_tile) on one tile.

    Returns (d_packed (R*S, 8), d_z (R, S), d_dnorm (R, 1), d_noise)."""
    sp = spec
    s = sp.samples
    fwd = _forward_tile(sp, packed, z, dnorm, noise)
    (a_raw, sigma, rgb, dists_raw, dists, alpha, u, trans, weights,
     col) = fwd
    _, _, mask = _outputs_tile(sp, fwd, z)

    d_rgb_out = [d_outs[:, c:c + 1] for c in range(3)]
    d_depth = d_outs[:, 3:4]
    d_med = d_outs[:, 4:5]
    d_acc = d_outs[:, 5:6]

    # Total cotangent into weights.
    g_w = d_weights + z * d_depth
    for c, dc in zip(rgb, d_rgb_out):
        g_w = g_w + c * dc
    if sp.use_white_background:
        white = d_rgb_out[0] + d_rgb_out[1] + d_rgb_out[2]
        g_w = g_w - white
    if sp.sample_at_infinity:
        g_w = g_w + jnp.where(col < s - 1, d_acc, 0.0)
    else:
        g_w = g_w + d_acc

    # Per-sample rgb logits.
    d_logits = [w_dc * c * (1.0 - c) for c, w_dc in
                zip(rgb, (weights * d for d in d_rgb_out))]

    # weights = alpha * trans;  trans_t = prod_{q<t} u_q.
    gw_w = g_w * weights
    rc = _rev_cumsum(gw_w)                    # Σ_{t>=s}
    d_u = (rc - gw_w) / u                     # Σ_{t>s} g_w_t w_t / u_s
    d_alpha = g_w * trans - d_u
    # alpha = 1 - exp(-sigma * dists)
    exp_term = 1.0 - alpha                    # exp(-sigma*dists)
    d_sigma = d_alpha * dists * exp_term
    d_dists = d_alpha * sigma * exp_term
    d_araw = d_sigma * jax.nn.sigmoid(a_raw)  # softplus'

    # dists = dists_raw * dnorm; dists_raw_s = z_{s+1} - z_s (last = const).
    d_dnorm = jnp.sum(d_dists * dists_raw, axis=1, keepdims=True)
    d_draw = d_dists * dnorm
    d_draw_in = jnp.where(col < s - 1, d_draw, 0.0)
    d_z = (jnp.where(col >= 1, pltpu.roll(d_draw_in, 1, axis=1), 0.0)
           - d_draw_in + weights * d_depth + mask * d_med)

    d_packed = _repack(sp, d_logits + [d_araw])
    d_noise = d_araw if noise is not None else None
    return d_packed, d_z, d_dnorm, d_noise


def _make_bwd_kernel(spec: CompositeSpec):
    sp = spec

    def kernel(*refs):
        packed_ref, z_ref, dnorm_ref = refs[0], refs[1], refs[2]
        off = 3
        noise_ref = refs[off] if sp.has_noise else None
        off += 1 if sp.has_noise else 0
        douts_ref, dw_ref = refs[off], refs[off + 1]
        off += 2
        dpacked_ref, dz_ref, ddnorm_ref = (refs[off], refs[off + 1],
                                           refs[off + 2])
        dnoise_ref = refs[off + 3] if sp.has_noise else None

        z = z_ref[0]
        noise = noise_ref[0] if sp.has_noise else None
        d_packed, d_z, d_dnorm, d_noise = _backward_tile(
            sp, packed_ref[0], z, dnorm_ref[0], noise, douts_ref[0],
            dw_ref[0])
        dpacked_ref[0] = d_packed
        dz_ref[0] = d_z
        ddnorm_ref[0] = d_dnorm
        if sp.has_noise:
            dnoise_ref[0] = d_noise
    return kernel


def _tile_io(arrays, n_tiles):
    """(B, W) per-ray arrays -> 3-D (n_tiles, rows, W) + full-block specs."""
    tiled, specs = [], []
    for a in arrays:
        rows = a.shape[0] // n_tiles
        tiled.append(a.reshape(n_tiles, rows, a.shape[1]))
        specs.append(pl.BlockSpec((1, rows, a.shape[1]),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM))
    return tiled, specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(spec, packed, z, dnorm, noise, u):
    sp = spec
    b = z.shape[0]
    n_tiles = b // sp.rays_per_tile
    # One packed row per ray (row-major (P, 8) -> (B, S*8) is free).
    pk_rows = packed.reshape(b, sp.samples * 8)
    ray_in, ray_specs = _tile_io(
        [pk_rows, z, dnorm] + ([noise] if sp.has_noise else [])
        + ([u] if sp.fine_samples else []), n_tiles)
    out_protos = [jnp.zeros((b, OUT_PAD)), jnp.zeros((b, sp.samples))]
    if sp.fine_samples:
        out_protos.append(jnp.zeros((b, sp.union_width)))
    out_shapes = [jax.ShapeDtypeStruct((n_tiles, sp.rays_per_tile,
                                        a.shape[1]), jnp.float32)
                  for a in out_protos]
    _, out_specs = _tile_io(out_protos, n_tiles)
    outs = pl.pallas_call(
        _make_fwd_kernel(sp),
        grid=(n_tiles,),
        in_specs=ray_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=sp.interpret,
        compiler_params=vmem_params(sp.interpret),
    )(*ray_in)
    z_union = (outs[2].reshape(b, sp.union_width)
               if sp.fine_samples else None)
    return outs[0].reshape(b, OUT_PAD), outs[1].reshape(b, sp.samples), \
        z_union


def _fused_fwd(spec, packed, z, dnorm, noise, u):
    out = _fused(spec, packed, z, dnorm, noise, u)
    return out, (packed, z, dnorm, noise, u)


def _fused_bwd(spec, res, g):
    packed, z, dnorm, noise, u = res
    # g[2] (the union fine depths' cotangent) is dropped by design: the
    # fine z's are detached in the reference (model_utils.py:204) and the
    # coarse depths are parameter-free, so nothing downstream of z_union
    # carries gradient to any parameter. u likewise gets no gradient.
    d_outs, d_weights = g[0], g[1]
    sp = spec
    b = z.shape[0]
    n_tiles = b // sp.rays_per_tile
    pk_rows = packed.reshape(b, sp.samples * 8)
    ray_in, ray_specs = _tile_io(
        [pk_rows, z, dnorm] + ([noise] if sp.has_noise else [])
        + [d_outs, d_weights], n_tiles)
    grad_rays, grad_specs = _tile_io(
        [jnp.zeros((b, sp.samples * 8)), jnp.zeros((b, sp.samples)),
         jnp.zeros((b, 1))]
        + ([jnp.zeros((b, sp.samples))] if sp.has_noise else []), n_tiles)
    out_shapes = [jax.ShapeDtypeStruct(a.shape, jnp.float32)
                  for a in grad_rays]
    outs = pl.pallas_call(
        _make_bwd_kernel(sp),
        grid=(n_tiles,),
        in_specs=ray_specs,
        out_specs=grad_specs,
        out_shape=out_shapes,
        interpret=sp.interpret,
        compiler_params=vmem_params(sp.interpret),
    )(*ray_in)
    d_packed = outs[0].reshape(packed.shape)
    d_z = outs[1].reshape(z.shape)
    d_dnorm = outs[2].reshape(dnorm.shape)
    d_noise = outs[3].reshape(noise.shape) if sp.has_noise else None
    d_u = jnp.zeros_like(u) if u is not None else None
    return d_packed, d_z, d_dnorm, d_noise, d_u


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_composite(spec: CompositeSpec, packed, z_vals, dirs, noise=None,
                    u=None):
    """Activations + volume rendering for packed level outputs.

    Args:
      spec: static CompositeSpec (samples, tile rays, white bg, infinity).
      packed: (B*S, 8) fp32 [rgb_logits(3) | raw_sigma(1) | ...] — the fused
        level kernel's output, pre-activation, pre-noise.
      z_vals: (B, S) sample depths.
      dirs: (B, 3) ray directions (norm scales the deltas).
      noise: (B, S) sigma noise (pre-scaled) or None; must match
        spec.has_noise.
      u: (B, fine_samples) ASCENDING uniforms (sorted_uniform / linspace)
        when spec.fine_samples > 0 — the kernel then also returns 'z_union',
        the (B, S + fine_samples) sorted hierarchical depths for the fine
        level (sample_pdf fused in; gradient-dead, see CompositeSpec).

    Returns:
      dict with 'rgb' (B, 3), 'depth' (B,), 'med_depth' (B,), 'acc' (B,),
      'weights' (B, S) — same semantics as ops/rendering.volumetric_rendering
      applied to sigmoid(rgb)/softplus(sigma + noise) — plus 'z_union' when
      spec.fine_samples > 0.
    """
    sp = spec
    b, s = z_vals.shape
    assert s == sp.samples, (s, sp.samples)
    assert (noise is not None) == sp.has_noise
    assert (u is not None) == (sp.fine_samples > 0)
    b_pad = _rup(b, sp.rays_per_tile)
    dnorm = jnp.linalg.norm(dirs, axis=-1, keepdims=True).astype(jnp.float32)

    def pad_rays(a):
        return (jnp.pad(a, ((0, b_pad - b), (0, 0))) if b_pad != b else a)

    packed = packed.astype(jnp.float32)
    if b_pad != b:
        packed = jnp.pad(packed, ((0, (b_pad - b) * s), (0, 0)))
    # Padded rays are zero-padded: padded dnorm is 0, which zeroes every
    # delta (dists = dz * dnorm), so alpha=0 and the cumprod stays finite;
    # outputs are sliced off below.
    z_in = pad_rays(z_vals.astype(jnp.float32))
    noise_in = pad_rays(noise.astype(jnp.float32)) if sp.has_noise else None
    u_in = pad_rays(u.astype(jnp.float32)) if sp.fine_samples else None
    outs, weights, z_union = _fused(sp, packed, z_in, pad_rays(dnorm),
                                    noise_in, u_in)
    outs = outs[:b]
    result = {
        'rgb': outs[:, :3],
        'depth': outs[:, 3],
        'med_depth': outs[:, 4],
        'acc': outs[:, 5],
        'weights': weights[:b],
    }
    if sp.fine_samples:
        # Drop the in-kernel merge's sentinel padding lanes (XLA slice).
        result['z_union'] = z_union[:b, :s + sp.fine_samples]
    return result
