"""Warp fields: translation and SE(3).

Capability parity with /root/reference/hypernerf/warping.py, rebuilt for TPU:

* ``TranslationField`` (warping.py:28-126): posenc_orig(points, 10 freqs) ++
  warp embed -> MLP depth 6 width 128 skips (4,), Xavier-normal hidden init,
  uniform(0, 1e-4) output init; warped = points + translation. The warp
  Jacobian — a ``NotImplementedError`` in the reference (warping.py:122) — is
  implemented via three batched forward-mode JVPs (``_warp_jacobian``).
* ``SE3Field`` (warping.py:128-272): the reference version is unbatched and
  broken (Readme.md:55); this one evaluates per sample with fully batched
  rigid-body math, guards theta -> 0 (the init regime), and feeds the warp
  metadata embedding to the trunk (the reference comments it out at
  warping.py:223-224, which would make the warp time-independent).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypernerf_tpu.models.modules import MLP
from hypernerf_tpu.ops import at_least_f32
from hypernerf_tpu.ops import rigid_body
from hypernerf_tpu.ops.posenc import posenc, posenc_orig

Dtype = Any


def _warp_jacobian(warp_fn, points):
    """(..., 3, 3) d warped / d points via three batched VJPs.

    A vmapped per-point ``jax.jacrev`` lowers to one tiny program per
    sample (measured ~810 rays/s end-to-end on TPU — two orders of
    magnitude off the training rate). Because the warp is pointwise, one
    batched linearization pulled back with the three coordinate cotangents
    yields each sample's Jacobian ROWS at ~4x the cost of one batched
    forward. (Reverse-mode, not jvp: the posencs carry custom VJPs.)
    jac[..., i, k] = d warped_i / d points_k — jacrev's layout.
    """
    _, pullback = jax.vjp(warp_fn, points)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype),
                           (*points.shape, 3))
    # One vmapped backward over the 3 coordinate cotangents (a leading
    # batch dim on the SAME linearization) instead of 3 sequential
    # pullbacks — XLA batches the transposed matmuls.
    rows = jax.vmap(lambda ct: pullback(ct)[0], in_axes=-1)(eye)
    return jnp.moveaxis(rows, 0, -2)


class TranslationField(nn.Module):
    """Predicts a per-point translation conditioned on a warp embedding.

    With ``use_pallas`` on TPU, the posenc+MLP run as one fused kernel
    (ops/pallas/fused_field.py) — the encoding and activations never leave
    VMEM. The jnp path remains the init/CPU/parity reference.
    """
    depth: int = 6
    width: int = 128
    n_freq: int = 10
    skips: Tuple[int, ...] = (4,)
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    pallas_tile: int = 1024
    pallas_interpret: bool = False

    def setup(self):
        self.mlp = MLP(out_ch=3,
                       depth=self.depth,
                       width=self.width,
                       hidden_init=nn.initializers.xavier_normal(),
                       output_init=nn.initializers.uniform(scale=1e-4),
                       skips=self.skips,
                       dtype=self.dtype,
                       name='mlp')

    def warp(self, points, embed, extra_params=None, allow_pallas=True):
        if (allow_pallas and self.use_pallas and not self.is_initializing()
                and (jax.default_backend() == 'tpu'
                     or self.pallas_interpret)):
            from hypernerf_tpu.ops.pallas.fused_field import (
                FusedFieldSpec, fused_field_mlp, mlp_params_to_list)
            spec = FusedFieldSpec(
                segments=((3, self.n_freq), (embed.shape[-1], 0)),
                depth=self.depth, width=self.width, out_ch=3,
                skips=tuple(self.skips), tile=self.pallas_tile,
                compute_dtype=str(jnp.dtype(self.dtype)),
                interpret=self.pallas_interpret)
            raw = jnp.concatenate(
                [points, embed.astype(points.dtype)],
                axis=-1).reshape(-1, 3 + embed.shape[-1])
            delta = fused_field_mlp(
                spec, raw, mlp_params_to_list(self.variables['params']['mlp']))
            return points + delta.reshape(*points.shape[:-1], 3)
        points_feat = posenc_orig(points, self.n_freq)
        inputs = jnp.concatenate([points_feat, embed.astype(points_feat.dtype)],
                                 axis=-1)
        translation = self.mlp(inputs).astype(points.dtype)
        return points + translation

    def __call__(self, points, embed, extra_params=None,
                 return_jacobian: bool = False):
        out = {'warped_points': self.warp(points, embed, extra_params)}
        if return_jacobian:
            # Batched forward-mode (dense path: the Pallas kernel has no
            # JVP rule, and a per-point call would be absurd anyway).
            out['jacobian'] = _warp_jacobian(
                lambda p: self.warp(p, embed, extra_params,
                                    allow_pallas=False), points)
        return out


class SE3Field(nn.Module):
    """Predicts a per-point rigid transform via the se(3) exponential map.

    With ``use_pallas`` on TPU, the posenc + trunk + w/v heads run as one
    fused kernel (ops/pallas/fused_se3.py); the exponential map and point
    transform stay in XLA (ops/rigid_body.py).
    """
    trunk_depth: int = 6
    trunk_width: int = 128
    min_deg: int = 0
    max_deg: int = 8
    use_posenc_identity: bool = False
    skips: Tuple[int, ...] = (4,)
    use_metadata: bool = True
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    pallas_tile: int = 1024
    pallas_interpret: bool = False

    def setup(self):
        self.trunk = MLP(out_ch=self.trunk_width,
                         depth=self.trunk_depth,
                         width=self.trunk_width,
                         hidden_init=nn.initializers.xavier_normal(),
                         skips=self.skips,
                         dtype=self.dtype,
                         name='trunk')
        # Zero head biases (torch_default_bias off): the screw/quaternion
        # exponential must start at the identity map, which needs w, v ~ 0
        # exactly — a U(+-1/sqrt(128)) default bias would start every point
        # rotated ~0.1 rad. (The reference's SE3 field is broken/untested,
        # so there is no reference init to match here; this is our design.)
        self.w_net = MLP(out_ch=3, depth=0, width=self.trunk_width,
                         output_init=nn.initializers.uniform(scale=1e-4),
                         torch_default_bias=False,
                         dtype=self.dtype, name='w_net')
        self.v_net = MLP(out_ch=3, depth=0, width=self.trunk_width,
                         output_init=nn.initializers.uniform(scale=1e-4),
                         torch_default_bias=False,
                         dtype=self.dtype, name='v_net')

    def warp(self, points, embed, extra_params=None, allow_pallas=True):
        alpha = None if extra_params is None else extra_params.get('warp_alpha')
        if (allow_pallas and self.use_pallas and not self.is_initializing()
                and not self.use_posenc_identity
                and (jax.default_backend() == 'tpu'
                     or self.pallas_interpret)):
            from hypernerf_tpu.ops.pallas.fused_field import encoding_scales
            from hypernerf_tpu.ops.pallas.fused_se3 import (FusedSE3Spec,
                                                            fused_se3_wv,
                                                            se3_params_to_list)
            spec = FusedSE3Spec(
                embed_ch=embed.shape[-1], use_metadata=self.use_metadata,
                min_deg=self.min_deg, max_deg=self.max_deg,
                depth=self.trunk_depth, width=self.trunk_width,
                skips=tuple(self.skips), tile=self.pallas_tile,
                compute_dtype=str(jnp.dtype(self.dtype)),
                windowed=alpha is not None,
                interpret=self.pallas_interpret)
            # The warp_alpha annealing window runs in-kernel as a per-band
            # scale row, so the annealed SE(3) stays on the fused path.
            scales = None
            if alpha is not None:
                seg_alphas = [alpha] + ([None] if self.use_metadata else [])
                scales = encoding_scales(spec.enc_segments, seg_alphas)
            w, v = fused_se3_wv(
                spec, points.reshape(-1, 3),
                embed.reshape(-1, embed.shape[-1]),
                se3_params_to_list(self.variables['params']),
                enc_scales=scales)
            warped = self._retract(w, v, at_least_f32(
                points.reshape(-1, 3)))
            return warped.reshape(points.shape)
        points_feat = posenc(points, self.min_deg, self.max_deg,
                             use_identity=self.use_posenc_identity, alpha=alpha)
        if self.use_metadata:
            inputs = jnp.concatenate(
                [points_feat, embed.astype(points_feat.dtype)], axis=-1)
        else:
            inputs = points_feat
        trunk_output = self.trunk(inputs)
        w = at_least_f32(self.w_net(trunk_output))
        v = at_least_f32(self.v_net(trunk_output))
        return self._retract(w, v, at_least_f32(points))

    def _retract(self, w, v, points, axis: int = -1):
        """Map raw (w, v) head outputs + points to warped points.

        Vector-form screw retraction (``rigid_body.se3_warp_vec``, equal
        to the exp_se3 matrix path and tested so) — no (..., 4, 4)
        intermediates, so XLA never lowers batched tiny matmuls.
        ``axis`` is the component axis: -1 for (..., 3) rows, 0 for
        component-major (3, N) — the layout the elastic side channel's
        retraction JVP runs in (full-lane; the row-major matrix path
        measured ~110 ms/step of 3-lane fusions+copies, BENCHMARKS
        round 5).
        """
        return rigid_body.se3_warp_vec(w, v, points, axis=axis)

    def __call__(self, points, embed, extra_params=None,
                 return_jacobian: bool = False):
        out = {'warped_points': self.warp(points, embed, extra_params)}
        if return_jacobian:
            # Batched forward-mode over the dense path (see _warp_jacobian).
            out['jacobian'] = _warp_jacobian(
                lambda p: self.warp(p, embed, extra_params,
                                    allow_pallas=False), points)
        return out


class QuaternionField(SE3Field):
    """Rotation (quaternion exp) + translation warp field.

    Same trunk / w / v heads and fused TPU kernel as SE3Field — only the
    retraction differs: the rotation vector is exponentiated through a unit
    quaternion (ops/quaternion.py) and the translation is applied AFTER the
    rotation, with no screw coupling. A beyond-reference variant (the
    reference ships translation and SE(3) only, warping.py:275-286); the
    ROADMAP's quaternion-exp warp.
    """

    def _retract(self, w, v, points, axis: int = -1):
        from hypernerf_tpu.ops import quaternion
        return quaternion.quat_warp_vec(w, v, points, axis=axis)
