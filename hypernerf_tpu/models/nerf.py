"""NerfModel: the top-level HyperNeRF model (coarse+fine, warp, hyper slicing).

Capability parity with /root/reference/hypernerf/models.py:67-780, rebuilt as
one pure flax module designed for a single jit-compiled megabatch:

* ``__call__(rays_dict, extra_params)`` runs the whole coarse+fine pipeline
  with no Python chunk loop (the reference chunks at train.py:108-111); memory
  tiling for full-image renders happens outside via ``lax.map`` (renderer.py).
* Stochasticity (stratified jitter, inverse-CDF draws, sigma noise) comes from
  explicit flax RNG collections ('sampling', 'sigma_noise') instead of global
  torch RNG.
* MLP matmuls run in the config's compute dtype (bf16 on the MXU); encodings,
  activations of the heads, and compositing stay fp32.
* Per-ray near/far from the ray tensor are honored (the reference reads then
  discards them, model_utils.py:389-390, silently rendering spheric scenes
  with the NDC near/far).
* Intended-behavior fixes over the reference: share_GLO=False works
  (models.py:167-168 NameErrors), fine MLP is only built when
  num_fine_samples > 0 (models.py:309), metadata interpolation splits (*, 3)
  correctly (models.py:369), warp Jacobians are implemented.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypernerf_tpu.configs import NerfConfig
from hypernerf_tpu.models.modules import GLOEmbed, HyperSheetMLP, NerfMLP
from hypernerf_tpu.ops import at_least_f32
from hypernerf_tpu.models.warping import (QuaternionField, SE3Field,
                                          TranslationField)
from hypernerf_tpu.ops.posenc import posenc, posenc_orig
from hypernerf_tpu.ops.rendering import (filter_sigma, noise_regularize,
                                         compute_depth_index,
                                         volumetric_rendering)
from hypernerf_tpu.ops.sampling import sample_along_rays, sample_pdf

# Default extra_params: posenc annealing alphas (None = window disabled).
DEFAULT_EXTRA_PARAMS: Dict[str, Any] = {
    'nerf_alpha': None,
    'warp_alpha': None,
    'hyper_alpha': None,
    'hyper_sheet_alpha': None,
}

# The metadata keys carried per ray (model_utils.py:396-399).
METADATA_KEYS = ('warp', 'camera', 'appearance', 'time')
WARP_EMBED_KEY = 'time'
HYPER_EMBED_KEY = 'time'
NERF_EMBED_KEY = 'warp'


class NerfModel(nn.Module):
    """HyperNeRF with coarse+fine MLPs, warp field and hyper-space slicing."""
    config: NerfConfig

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.compute_dtype)
        if cfg.use_warp:
            self.warp_embed = GLOEmbed(cfg.num_embeddings, cfg.glo_dim,
                                       name='warp_embed')
            if cfg.warp_field_type == 'translation':
                self.warp_field = TranslationField(
                    depth=cfg.warp_depth, width=cfg.warp_width,
                    n_freq=cfg.warp_freq, skips=cfg.skips, dtype=dtype,
                    use_pallas=cfg.use_pallas and cfg.use_pallas_fields,
                    pallas_tile=cfg.pallas_tile,
                    pallas_interpret=cfg.pallas_interpret,
                    name='warp_field')
            else:
                field_cls = (QuaternionField
                             if cfg.warp_field_type == 'quaternion'
                             else SE3Field)
                self.warp_field = field_cls(
                    trunk_depth=cfg.warp_depth, trunk_width=cfg.warp_width,
                    min_deg=cfg.warp_min_deg, max_deg=cfg.warp_max_deg,
                    skips=cfg.skips, dtype=dtype,
                    use_pallas=cfg.use_pallas and cfg.use_pallas_fields,
                    pallas_tile=cfg.pallas_tile,
                    pallas_interpret=cfg.pallas_interpret,
                    name='warp_field')
        if cfg.has_hyper_embed and not cfg.hyper_use_warp_embed:
            self.hyper_embed = GLOEmbed(cfg.num_embeddings, cfg.glo_dim,
                                        name='hyper_embed')
        if cfg.hyper_slice_method == 'bendy_sheet':
            self.hyper_sheet_mlp = HyperSheetMLP(
                out_ch=cfg.hyper_slice_out_dim,
                depth=cfg.hyper_sheet_depth,
                width=cfg.hyper_sheet_width,
                n_freq=cfg.hyper_sheet_freq,
                skips=cfg.skips,
                use_residual=cfg.hyper_sheet_use_residual,
                use_pallas=cfg.use_pallas and cfg.use_pallas_fields,
                pallas_tile=cfg.pallas_tile,
                pallas_interpret=cfg.pallas_interpret,
                dtype=dtype,
                name='hyper_sheet_mlp')
        if cfg.use_nerf_embed and not cfg.nerf_use_warp_embed:
            self.nerf_embed = GLOEmbed(cfg.num_embeddings, cfg.glo_dim,
                                       name='nerf_embed')

        template_kwargs = dict(
            trunk_depth=cfg.trunk_depth,
            trunk_width=cfg.trunk_width,
            rgb_branch_depth=cfg.rgb_branch_depth,
            rgb_branch_width=cfg.rgb_branch_width,
            rgb_channels=cfg.rgb_channels,
            alpha_channels=cfg.alpha_channels,
            skips=cfg.skips,
            use_pallas=cfg.use_pallas,
            pallas_tile=cfg.pallas_tile,
            pallas_interpret=cfg.pallas_interpret,
            dtype=dtype)
        self.nerf_mlp_coarse = NerfMLP(name='nerf_coarse', **template_kwargs)
        if cfg.num_fine_samples > 0:
            self.nerf_mlp_fine = NerfMLP(name='nerf_fine', **template_kwargs)

    # ------------------------------------------------------------------ embeds

    @staticmethod
    def _encode_embed(embed_module, meta):
        """Encode metadata into embeddings.

        meta is (*, 1) (a single id) or (*, 3) (left id, right id, and a
        progression in [0,1] interpolating between them — models.py:351-374,
        with the split fixed to 1/1/1).
        """
        if meta.shape[-1] == 3:
            left = embed_module(meta[..., 0].astype(jnp.int32))
            right = embed_module(meta[..., 1].astype(jnp.int32))
            progression = meta[..., 2:3].astype(left.dtype)
            return (1.0 - progression) * left + progression * right
        return embed_module(meta)

    def encode_warp_embed(self, metadata):
        return self._encode_embed(self.warp_embed, metadata[WARP_EMBED_KEY])

    def encode_hyper_embed(self, metadata):
        if not self.config.has_hyper_embed:
            raise ValueError('Model has no hyper embedding.')
        if self.config.hyper_use_warp_embed:
            return self._encode_embed(self.warp_embed, metadata[WARP_EMBED_KEY])
        return self._encode_embed(self.hyper_embed, metadata[HYPER_EMBED_KEY])

    def encode_nerf_embed(self, metadata):
        if self.config.nerf_use_warp_embed:
            return self._encode_embed(self.warp_embed, metadata[WARP_EMBED_KEY])
        return self._encode_embed(self.nerf_embed, metadata[NERF_EMBED_KEY])

    # -------------------------------------------------------------- conditions

    def get_condition_inputs(self, viewdirs, metadata, extra_params,
                             metadata_encoded: bool = False):
        """Per-ray condition vectors for the template (models.py:404-445)."""
        cfg = self.config
        alpha_conditions = []
        rgb_conditions = []

        if cfg.use_viewdirs:
            if cfg.use_original_embed:
                viewdirs_feat = posenc_orig(viewdirs, cfg.dir_freq)
            else:
                viewdirs_feat = posenc(viewdirs,
                                       min_deg=cfg.viewdir_min_deg,
                                       max_deg=cfg.viewdir_max_deg,
                                       use_identity=True,
                                       alpha=extra_params.get('nerf_alpha'))
            rgb_conditions.append(viewdirs_feat)

        if cfg.use_nerf_embed:
            if metadata_encoded:
                nerf_embed = metadata['encoded_nerf']
            else:
                nerf_embed = self.encode_nerf_embed(metadata)
            if cfg.use_alpha_condition:
                alpha_conditions.append(nerf_embed)
            if cfg.use_rgb_condition:
                rgb_conditions.append(nerf_embed)

        alpha_condition = (jnp.concatenate(alpha_conditions, axis=-1)
                           if alpha_conditions else None)
        rgb_condition = (jnp.concatenate(rgb_conditions, axis=-1)
                         if rgb_conditions else None)
        return alpha_condition, rgb_condition

    # ---------------------------------------------------------------- template

    def query_template(self, level, points, viewdirs, metadata, extra_params,
                       metadata_encoded: bool = False, stratified: bool = True):
        """Positional-encode (spatial ++ hyper) points and run the NeRF MLP.

        Mirrors models.py:447-493: posenc_orig(xyz, xyz_freq) ++
        posenc_orig(hyper, hyper_freq) -> NerfMLP -> sigma noise ->
        sigmoid rgb / softplus sigma (applied here in fp32).
        """
        cfg = self.config
        alpha_condition, rgb_condition = self.get_condition_inputs(
            viewdirs, metadata, extra_params, metadata_encoded)

        # Fully fused path: raw warped points go straight into the Pallas
        # template kernel, which computes the positional encoding in VMEM
        # (ops/pallas/fused_mlp.py enc_segments) — no encoded feature tensor
        # ever reaches HBM. The Nerfies windowed encoding runs in-kernel too
        # (per-band scale row from the annealing alphas), so the anneal mode
        # stays on the fast path.
        if (cfg.use_pallas and not self.is_initializing()
                and rgb_condition is not None
                and (jax.default_backend() == 'tpu'
                     or cfg.pallas_interpret)):
            raw = self._query_template_fused(
                level, points, alpha_condition, rgb_condition, extra_params)
            raw_alpha = at_least_f32(raw['alpha'])
            noise_key = None
            if (stratified and cfg.noise_std is not None
                    and cfg.noise_std > 0.0 and self.has_rng('sigma_noise')):
                noise_key = self.make_rng('sigma_noise')
            raw_alpha = noise_regularize(noise_key, raw_alpha, cfg.noise_std,
                                         stratified)
            rgb = nn.sigmoid(at_least_f32(raw['rgb']))
            sigma = nn.softplus(jnp.squeeze(raw_alpha, axis=-1))
            return rgb, sigma

        if cfg.use_original_embed:
            points_feat = posenc_orig(points[..., :3], cfg.xyz_freq)
        else:
            points_feat = posenc(points[..., :3],
                                 min_deg=cfg.spatial_point_min_deg,
                                 max_deg=cfg.spatial_point_max_deg,
                                 use_identity=True,
                                 alpha=extra_params.get('nerf_alpha'))
        if points.shape[-1] > 3:
            if cfg.use_original_embed:
                hyper_feat = posenc_orig(points[..., 3:], cfg.hyper_freq)
            else:
                hyper_feat = posenc(points[..., 3:],
                                    min_deg=cfg.hyper_point_min_deg,
                                    max_deg=cfg.hyper_point_max_deg,
                                    use_identity=False,
                                    alpha=extra_params.get('hyper_alpha'))
            points_feat = jnp.concatenate([points_feat, hyper_feat], axis=-1)

        mlp = self.nerf_mlp_fine if level == 'fine' else self.nerf_mlp_coarse
        raw = mlp(points_feat, alpha_condition=alpha_condition,
                  rgb_condition=rgb_condition)

        raw_alpha = at_least_f32(raw['alpha'])
        noise_key = None
        if (stratified and cfg.noise_std is not None and cfg.noise_std > 0.0
                and self.has_rng('sigma_noise')):
            noise_key = self.make_rng('sigma_noise')
        raw_alpha = noise_regularize(noise_key, raw_alpha, cfg.noise_std,
                                     stratified)

        rgb = nn.sigmoid(at_least_f32(raw['rgb']))
        sigma = nn.softplus(jnp.squeeze(raw_alpha, axis=-1))
        return rgb, sigma

    def _render_level_fused(self, level, points, warp_embed_per_ray,
                            alpha_condition, rgb_condition, stratified,
                            extra_params, origins=None, directions=None,
                            z_vals=None, use_sample_at_infinity=True,
                            render_opts=None, fine_u=None):
        """One-kernel warp+hyper+template evaluation (TPU Pallas path).

        Returns a full per-ray render dict (rgb/depth/med_depth/acc/weights)
        when the ray-native + fused-compositing path applies, else the
        per-sample (rgb, sigma) pair for the caller to composite.
        """
        from hypernerf_tpu.ops.pallas.fused_field import (encoding_scales,
                                                          mlp_params_to_list)
        from hypernerf_tpu.ops.pallas.fused_level import (FusedLevelSpec,
                                                          fused_level)
        from hypernerf_tpu.ops.pallas.fused_mlp import nerf_mlp_params_to_list
        cfg = self.config
        mlp_mod = (self.nerf_mlp_fine if level == 'fine'
                   else self.nerf_mlp_coarse)
        batch_shape = points.shape[:-1]

        # Ray-native mode: conditions (viewdir posenc, GLO embeds) and ray
        # geometry stay per-RAY; the kernels expand o + z*d and the embeds
        # in VMEM and reduce their gradients per ray — none of the (P, C)
        # broadcasts or the (P, 3) points ever reach HBM. Requires every
        # tile to hold whole rays.
        n_samples = batch_shape[-1]
        bwd_tile = min(cfg.pallas_tile, cfg.pallas_bwd_tile)
        if cfg.warp_field_type != 'translation':
            # The hand-derived retraction VJPs (ops/rigid_body.
            # se3_warp_vec_bwd, ops/quaternion.quat_warp_vec_bwd) replaced
            # the in-kernel jax.vjp residual stash, and the raised scoped
            # VMEM limit (ops/pallas/common.py) admits tile 1024 (~24.5M).
            # Measured on TPU: 1024 is throughput-equal to 512 (49.3k
            # rays/s se3) — the fields backward is no longer tile-bound.
            bwd_tile = min(bwd_tile, 1024)
        tmpl_bwd_tile = FusedLevelSpec._field_defaults['tmpl_bwd_tile']
        have_rays = (origins is not None and directions is not None
                     and z_vals is not None)
        cond_samples = n_samples if have_rays and all(
            t % n_samples == 0
            for t in (cfg.pallas_tile, bwd_tile, tmpl_bwd_tile)) else 0
        # Fully fused render: compositing runs in its own ray-major kernel
        # on the packed level output (render_opts filtering needs per-sample
        # sigma, so it falls back to the XLA compositing path).
        composite = bool(cond_samples) and not render_opts

        def flat_cond(c):
            if cond_samples:
                return c.reshape(-1, c.shape[-1])
            c = jnp.broadcast_to(c[..., None, :], (*batch_shape, c.shape[-1]))
            return c.reshape(-1, c.shape[-1])

        spec = FusedLevelSpec(
            embed_ch=cfg.glo_dim,
            warp_type=cfg.warp_field_type,
            warp_depth=cfg.warp_depth, warp_width=cfg.warp_width,
            warp_freq=cfg.warp_freq,
            se3_min_deg=cfg.warp_min_deg, se3_max_deg=cfg.warp_max_deg,
            # Always thread the warp window for the SE(3)/quaternion trunks
            # so warp_alpha is honored whenever set (ones = fully on).
            warp_windowed=cfg.warp_field_type in ('se3', 'quaternion'),
            slice_method=cfg.hyper_slice_method,
            hyper_depth=cfg.hyper_sheet_depth,
            hyper_width=cfg.hyper_sheet_width,
            hyper_sheet_freq=cfg.hyper_sheet_freq,
            # axis_aligned_plane: the hyper coords ARE the embed
            # (models.py:514-543) — no hyper MLP runs in the kernel.
            hyper_out=(cfg.glo_dim
                       if cfg.hyper_slice_method == 'axis_aligned_plane'
                       else cfg.hyper_slice_out_dim),
            use_original_embed=cfg.use_original_embed,
            xyz_freq=cfg.xyz_freq, hyper_freq=cfg.hyper_freq,
            spatial_min_deg=cfg.spatial_point_min_deg,
            spatial_max_deg=cfg.spatial_point_max_deg,
            hyper_min_deg=cfg.hyper_point_min_deg,
            hyper_max_deg=cfg.hyper_point_max_deg,
            trunk_depth=cfg.trunk_depth, trunk_width=cfg.trunk_width,
            rgb_depth=cfg.rgb_branch_depth, rgb_width=cfg.rgb_branch_width,
            rgb_channels=cfg.rgb_channels,
            alpha_channels=cfg.alpha_channels,
            rgb_cond_ch=rgb_condition.shape[-1],
            alpha_cond_ch=(alpha_condition.shape[-1]
                           if alpha_condition is not None else 0),
            skips=cfg.skips,
            tile=cfg.pallas_tile,
            bwd_tile=bwd_tile,
            compute_dtype=cfg.compute_dtype,
            cond_samples=cond_samples,
            pipelined_bwd=cfg.pallas_pipelined_bwd,
            pipelined_fwd=cfg.pallas_pipelined_fwd,
            interleaved_fwd=cfg.pallas_interleaved_fwd,
            bf16_epilogue=cfg.pallas_bf16_epilogue,
            interpret=cfg.pallas_interpret)
        tmpl_scales = None
        if not cfg.use_original_embed:
            alphas = [extra_params.get('nerf_alpha'),
                      extra_params.get('hyper_alpha')]
            tmpl_scales = encoding_scales(spec.tmpl_enc_segments, alphas)
        if cfg.warp_field_type in ('se3', 'quaternion'):
            from hypernerf_tpu.ops.pallas.fused_se3 import se3_params_to_list
            warp_pairs = se3_params_to_list(
                self.warp_field.variables['params'])
            warp_scales = encoding_scales(
                spec.warp_fs.enc_segments,
                [extra_params.get('warp_alpha'), None])
        else:
            warp_pairs = mlp_params_to_list(
                self.warp_field.variables['params']['mlp'])
            warp_scales = None
        out = fused_level(
            spec,
            None if cond_samples else points.reshape(-1, 3),
            flat_cond(warp_embed_per_ray),
            flat_cond(rgb_condition),
            flat_cond(alpha_condition) if alpha_condition is not None
            else None,
            warp_pairs,
            (mlp_params_to_list(
                self.hyper_sheet_mlp.variables['params']['mlp'])
             if cfg.hyper_slice_method == 'bendy_sheet' else []),
            nerf_mlp_params_to_list(mlp_mod.variables['params']),
            tmpl_enc_scales=tmpl_scales,
            warp_enc_scales=warp_scales,
            origins=(origins.reshape(-1, 3) if cond_samples else None),
            directions=(directions.reshape(-1, 3) if cond_samples
                        else None),
            z_vals=(z_vals.reshape(-1, n_samples) if cond_samples
                    else None),
            return_packed=composite)

        noise_key = None
        if (stratified and cfg.noise_std is not None and cfg.noise_std > 0.0
                and self.has_rng('sigma_noise')):
            noise_key = self.make_rng('sigma_noise')

        if composite:
            from hypernerf_tpu.ops.pallas.fused_composite import (
                CompositeSpec, fused_composite)
            z2 = z_vals.reshape(-1, n_samples)
            noise = None
            if noise_key is not None:
                noise = (jax.random.normal(noise_key, z2.shape, jnp.float32)
                         * cfg.noise_std)
            n_fine = fine_u.shape[-1] if fine_u is not None else 0
            cspec = CompositeSpec(
                samples=n_samples,
                rays_per_tile=max(8, 8192 // n_samples),
                use_white_background=cfg.use_white_background,
                sample_at_infinity=use_sample_at_infinity,
                has_noise=noise is not None,
                fine_samples=n_fine,
                interpret=cfg.pallas_interpret)
            comp = fused_composite(cspec, out, z2,
                                   directions.reshape(-1, 3), noise,
                                   u=(fine_u.reshape(-1, n_fine)
                                      if n_fine else None))
            lead = batch_shape[:-1]
            result = {
                'rgb': comp['rgb'].reshape(*lead, cfg.rgb_channels),
                'depth': comp['depth'].reshape(lead),
                'med_depth': comp['med_depth'].reshape(lead),
                'acc': comp['acc'].reshape(lead),
                'weights': comp['weights'].reshape(*lead, n_samples),
            }
            if n_fine:
                result['z_union'] = comp['z_union'].reshape(
                    *lead, n_samples + n_fine)
            return result

        raw_alpha = out['alpha'].reshape(*batch_shape,
                                         cfg.alpha_channels)
        raw_alpha = noise_regularize(noise_key, raw_alpha, cfg.noise_std,
                                     stratified)
        rgb = nn.sigmoid(out['rgb'].reshape(*batch_shape, cfg.rgb_channels))
        sigma = nn.softplus(jnp.squeeze(raw_alpha, axis=-1))
        return rgb, sigma

    def _template_segments(self, hyper_ch: int):
        """Template encoding segments for the fused kernels (orig or
        Nerfies), mirroring query_template's XLA encoding."""
        cfg = self.config
        if cfg.use_original_embed:
            segments = ((3, cfg.xyz_freq),)
            if hyper_ch:
                segments += ((hyper_ch, cfg.hyper_freq),)
        else:
            segments = ((3, cfg.spatial_point_max_deg
                         - cfg.spatial_point_min_deg,
                         cfg.spatial_point_min_deg, True),)
            if hyper_ch:
                segments += ((hyper_ch, cfg.hyper_point_max_deg
                              - cfg.hyper_point_min_deg,
                              cfg.hyper_point_min_deg, False),)
        return segments

    def _template_enc_scales(self, segments, extra_params):
        """(1, in_pad) window row for the Nerfies mode (None for orig)."""
        cfg = self.config
        if cfg.use_original_embed:
            return None
        from hypernerf_tpu.ops.pallas.fused_field import encoding_scales
        alphas = [extra_params.get('nerf_alpha'),
                  extra_params.get('hyper_alpha')][:len(segments)]
        return encoding_scales(segments, alphas)

    def _query_template_fused(self, level, points, alpha_condition,
                              rgb_condition, extra_params):
        """Raw-points fused template evaluation (TPU Pallas path)."""
        from hypernerf_tpu.ops.pallas.fused_field import seg_enc_ch
        from hypernerf_tpu.ops.pallas.fused_mlp import (FusedMLPSpec,
                                                        fused_nerf_mlp,
                                                        nerf_mlp_params_to_list)
        cfg = self.config
        mlp_mod = (self.nerf_mlp_fine if level == 'fine'
                   else self.nerf_mlp_coarse)
        batch_shape = points.shape[:-1]
        hyper_ch = points.shape[-1] - 3
        segments = self._template_segments(hyper_ch)
        in_ch = sum(seg_enc_ch(seg) for seg in segments)
        enc_scales = self._template_enc_scales(segments, extra_params)

        # Per-ray conditions when every tile holds whole rays (see
        # _render_level_fused).
        n_samples = batch_shape[-1]
        bwd_tile = min(cfg.pallas_tile, 512)  # template bwd VMEM ceiling
        cond_samples = n_samples if (cfg.pallas_tile % n_samples == 0
                                     and bwd_tile % n_samples == 0) else 0

        def flat_cond(c):
            if cond_samples:
                return c.reshape(-1, c.shape[-1])
            c = jnp.broadcast_to(c[..., None, :], (*batch_shape, c.shape[-1]))
            return c.reshape(-1, c.shape[-1])

        spec = FusedMLPSpec(
            in_ch=in_ch,
            windowed=not cfg.use_original_embed,
            trunk_depth=cfg.trunk_depth,
            trunk_width=cfg.trunk_width,
            rgb_depth=cfg.rgb_branch_depth,
            rgb_width=cfg.rgb_branch_width,
            rgb_channels=cfg.rgb_channels,
            alpha_channels=cfg.alpha_channels,
            skips=cfg.skips,
            rgb_cond_ch=rgb_condition.shape[-1],
            alpha_cond_ch=(alpha_condition.shape[-1]
                           if alpha_condition is not None else 0),
            tile=cfg.pallas_tile,
            bwd_tile=bwd_tile,
            compute_dtype=cfg.compute_dtype,
            enc_segments=segments,
            cond_samples=cond_samples,
            interpret=cfg.pallas_interpret)
        pairs = nerf_mlp_params_to_list(mlp_mod.variables['params'])
        out = fused_nerf_mlp(
            spec, points.reshape(-1, points.shape[-1]),
            flat_cond(rgb_condition),
            flat_cond(alpha_condition) if alpha_condition is not None
            else None,
            pairs, enc_scales=enc_scales)
        return {'rgb': out['rgb'].reshape(*batch_shape, cfg.rgb_channels),
                'alpha': out['alpha'].reshape(*batch_shape,
                                              cfg.alpha_channels)}

    # ------------------------------------------------------------------- warps

    def map_spatial_points(self, points, warp_embed, extra_params,
                           use_warp: bool = True,
                           return_warp_jacobian: bool = False):
        warp_jacobian = None
        if self.config.use_warp and use_warp:
            warp_out = self.warp_field(points, warp_embed, extra_params,
                                       return_jacobian=return_warp_jacobian)
            if return_warp_jacobian:
                warp_jacobian = warp_out['jacobian']
            warped_points = warp_out['warped_points']
        else:
            warped_points = points
        return warped_points, warp_jacobian

    def map_hyper_points(self, points, hyper_embed, extra_params,
                         hyper_point_override=None):
        """Maps input points to hyper-space coordinates (models.py:514-543)."""
        cfg = self.config
        if hyper_point_override is not None:
            return jnp.broadcast_to(
                hyper_point_override[:, None, :],
                (*points.shape[:-1], hyper_point_override.shape[-1]))
        if cfg.hyper_slice_method == 'axis_aligned_plane':
            return hyper_embed
        if cfg.hyper_slice_method == 'bendy_sheet':
            return self.hyper_sheet_mlp(
                points, hyper_embed,
                alpha=extra_params.get('hyper_sheet_alpha')).astype(
                    jnp.promote_types(points.dtype, jnp.float32))
        return None

    def map_points(self, points, warp_embed, hyper_embed, extra_params,
                   use_warp: bool = True, return_warp_jacobian: bool = False,
                   hyper_point_override=None):
        """Warp spatial points and append hyper coordinates (models.py:545-581)."""
        if not use_warp:
            return points, None
        spatial_points, warp_jacobian = self.map_spatial_points(
            points, warp_embed, extra_params, use_warp=use_warp,
            return_warp_jacobian=return_warp_jacobian)
        hyper_points = self.map_hyper_points(
            points, hyper_embed, extra_params,
            hyper_point_override=hyper_point_override)
        if hyper_points is not None:
            warped_points = jnp.concatenate([spatial_points, hyper_points],
                                            axis=-1)
        else:
            warped_points = spatial_points
        return warped_points, warp_jacobian

    def apply_warp(self, points, warp_metadata, extra_params):
        warp_embed = self.warp_embed(warp_metadata)
        return self.warp_field(points, warp_embed, extra_params)

    def query_sigma(self, points, metadata_id, extra_params=None):
        """Template density at raw world points for one metadata id.

        Used by the occupancy grid refresh (ops/occupancy.py): runs the full
        warp -> hyper -> template chain deterministically (no sigma noise)
        and returns only the density.

        Args:
          points: (N, 3) world positions.
          metadata_id: (N, 1) integer id (same for all rows typically).
          extra_params: posenc annealing alphas.

        Returns:
          (N,) densities.
        """
        cfg = self.config
        extra_params = {**DEFAULT_EXTRA_PARAMS, **(extra_params or {})}
        metadata = {k: metadata_id for k in METADATA_KEYS}
        use_warp = cfg.use_warp

        warp_embed = self.encode_warp_embed(metadata) if use_warp else None
        if cfg.has_hyper_embed:
            hyper_embed = (warp_embed if cfg.hyper_use_warp_embed
                           else self.encode_hyper_embed(metadata))
        else:
            hyper_embed = None

        pts = points[:, None, :]  # (N, 1, 3)
        we = warp_embed[:, None, :] if warp_embed is not None else None
        he = hyper_embed[:, None, :] if hyper_embed is not None else None
        warped, _ = self.map_points(pts, we, he, extra_params,
                                    use_warp=use_warp)
        viewdirs = jnp.zeros_like(points)
        _, sigma = self.query_template(
            'fine' if cfg.num_fine_samples > 0 else 'coarse', warped,
            viewdirs, metadata, extra_params=extra_params,
            stratified=False)
        return sigma[:, 0]

    # ---------------------------------------------------------------- rendering

    def _warp_jacobian_side_channel(self, out, points, warp_embed,
                                    extra_params):
        """Attach the elastic-loss warp Jacobian to a fused-path result.

        With ``config.elastic_jacobian_samples`` K > 0, the Jacobian is
        evaluated at only K points per ray, drawn proportional to the
        rendering weights (available here — the fused composite already
        ran). ``out['warp_jacobian_weights']`` carries the importance
        weights W/K so the training loss's per-sample reduce
        sum(w * e) is an unbiased estimator of the full weighted penalty
        (losses.weighted_elastic_loss). The draw is stop-gradient; W and
        the Jacobians stay differentiable.
        """
        cfg = self.config
        from hypernerf_tpu.models.warping import _warp_jacobian
        k = cfg.elastic_jacobian_samples
        if k > 0 and self.has_rng('sampling'):
            from hypernerf_tpu.ops.sampling import weighted_sample_indices
            w = jax.lax.stop_gradient(out['weights'])
            idx = weighted_sample_indices(self.make_rng('sampling'), w, k)
            points = jnp.take_along_axis(points, idx[..., None], axis=-2)
            w_sum = jnp.sum(out['weights'], axis=-1, keepdims=True)
            out['warp_jacobian_weights'] = jnp.broadcast_to(
                w_sum / k, idx.shape)
        # The embed is constant across a ray's samples, so build it by
        # broadcast AFTER the subsample instead of gathering a broadcast:
        # the gather's backward was a 5.3 ms/level scatter-add on TPU
        # (profile, BENCHMARKS round 4); the broadcast's backward is a
        # cheap reduce over K. Same values either way.
        embed_b = jnp.broadcast_to(
            warp_embed[..., None, :],
            (*points.shape[:-1], warp_embed.shape[-1]))
        backend_ok = (jax.default_backend() == 'tpu'
                      or cfg.pallas_interpret)
        if cfg.warp_field_type == 'translation' and backend_ok:
            # Fused path: stacked forward-mode tangents through the warp
            # MLP in one Pallas kernel (ops/pallas/fused_jacobian.py) —
            # replaces the dense 3-pullback side channel that held
            # elastic mode at 0.80x the flagship. Exact-gradient parity
            # vs the dense path: tests/test_fused_jacobian.py.
            from hypernerf_tpu.ops.pallas.fused_field import (
                FusedFieldSpec, mlp_params_to_list)
            from hypernerf_tpu.ops.pallas.fused_jacobian import (
                fused_warp_jacobian)
            jac_spec = FusedFieldSpec(
                segments=((3, cfg.warp_freq), (cfg.glo_dim, 0)),
                depth=cfg.warp_depth, width=cfg.warp_width, out_ch=3,
                skips=cfg.skips, tile=min(cfg.pallas_tile, 512),
                compute_dtype=cfg.compute_dtype,
                interpret=cfg.pallas_interpret)
            # d(embed) through a relu-MLP Jacobian is EXACTLY zero a.e.
            # (asserted in tests/test_fused_jacobian.py), and d(points) is
            # dead upstream (z draws are stop-gradient, ops/sampling.py) —
            # stop the embed so XLA prunes the whole cotangent plumbing.
            out['warp_jacobian'] = fused_warp_jacobian(
                jac_spec, points, jax.lax.stop_gradient(embed_b),
                mlp_params_to_list(
                    self.warp_field.variables['params']['mlp']))
            return
        if (cfg.warp_field_type in ('se3', 'quaternion') and backend_ok
                and not self.warp_field.use_posenc_identity):
            # Fused path for the screw-family warps: primal (w, v) +
            # stacked point-tangents through the SE(3) trunk/heads in one
            # kernel (ops/pallas/fused_se3_jacobian.py); the closed-form
            # retraction is differentiated outside via one vmapped
            # jax.jvp. Unlike the translation kernel the embed gradient
            # is NONZERO (the retraction consumes the primal w, v), so
            # the embed is NOT stopped — exact-gradient parity vs the
            # dense path: tests/test_fused_se3_jacobian.py.
            from hypernerf_tpu.ops.pallas.fused_field import encoding_scales
            from hypernerf_tpu.ops.pallas.fused_se3 import (
                FusedSE3Spec, se3_params_to_list)
            from hypernerf_tpu.ops.pallas.fused_se3_jacobian import (
                fused_se3_warp_jacobian)
            alpha = extra_params.get('warp_alpha')
            jac_spec = FusedSE3Spec(
                embed_ch=cfg.glo_dim, use_metadata=True,
                min_deg=cfg.warp_min_deg, max_deg=cfg.warp_max_deg,
                depth=cfg.warp_depth, width=cfg.warp_width,
                skips=cfg.skips, tile=min(cfg.pallas_tile, 512),
                bwd_tile=min(cfg.pallas_tile, cfg.pallas_bwd_tile, 256),
                compute_dtype=cfg.compute_dtype,
                windowed=alpha is not None,
                interpret=cfg.pallas_interpret)
            scales = (encoding_scales(jac_spec.enc_segments, [alpha, None])
                      if alpha is not None else None)
            out['warp_jacobian'] = fused_se3_warp_jacobian(
                jac_spec, points, embed_b,
                se3_params_to_list(self.warp_field.variables['params']),
                self.warp_field._retract, enc_scales=scales)
            return
        out['warp_jacobian'] = _warp_jacobian(
            lambda p: self.warp_field.warp(
                p, embed_b, extra_params, allow_pallas=False), points)

    def render_samples(self, level, points, z_vals, directions, viewdirs,
                       metadata, extra_params, use_warp: bool = True,
                       metadata_encoded: bool = False,
                       return_warp_jacobian: bool = False,
                       use_sample_at_infinity: bool = True,
                       stratified: bool = True,
                       render_opts=None,
                       return_points: bool = False,
                       origins=None,
                       fine_u=None):
        """Evaluate warp + template + compositing for one level (models.py:587-671)."""
        cfg = self.config
        out = {}
        batch_shape = points.shape[:-1]

        if use_warp:
            if metadata_encoded:
                warp_embed = metadata['encoded_warp']
            else:
                warp_embed = self.encode_warp_embed(metadata)
        else:
            warp_embed = None

        if cfg.has_hyper_embed:
            if metadata_encoded:
                hyper_embed = metadata['encoded_hyper']
            elif cfg.hyper_use_warp_embed:
                hyper_embed = warp_embed
            else:
                hyper_embed = self.encode_hyper_embed(metadata)
        else:
            hyper_embed = None

        # Fully fused fast path: warp + hyper sheet + template in one Pallas
        # kernel per level (ops/pallas/fused_level.py).
        if (cfg.use_pallas and cfg.use_pallas_level and use_warp
                and cfg.hyper_slice_method in ('bendy_sheet',
                                               'axis_aligned_plane')
                and cfg.hyper_use_warp_embed
                and warp_embed is not None
                and not return_points
                and metadata.get('hyper_point') is None
                and not self.is_initializing()
                and (jax.default_backend() == 'tpu'
                     or cfg.pallas_interpret)):
            alpha_condition, rgb_condition = self.get_condition_inputs(
                viewdirs, metadata, extra_params, metadata_encoded)
            if rgb_condition is not None:
                fused = self._render_level_fused(
                    level, points, warp_embed, alpha_condition,
                    rgb_condition, stratified, extra_params,
                    origins=origins, directions=directions, z_vals=z_vals,
                    use_sample_at_infinity=use_sample_at_infinity,
                    render_opts=render_opts, fine_u=fine_u)
                if isinstance(fused, dict):
                    # Compositing already ran in the fused ray-major kernel.
                    out.update(fused)
                else:
                    rgb, sigma = fused
                    sigma = filter_sigma(points, sigma, render_opts)
                    out.update(volumetric_rendering(
                        rgb, sigma, z_vals, directions,
                        use_white_background=cfg.use_white_background,
                        sample_at_infinity=use_sample_at_infinity))
                if return_warp_jacobian:
                    # Elastic-loss side channel: the render stays on the
                    # fused kernels; only d(warp)/d(points) — batched
                    # pullbacks through the SMALL warp MLP (warping.py
                    # _warp_jacobian) — runs on the dense path. The
                    # alternative (rendering the whole level densely
                    # whenever the Jacobian is wanted) costs ~5x the step.
                    self._warp_jacobian_side_channel(
                        out, points, warp_embed, extra_params)
                return out

        # Broadcast per-ray embeddings across samples.
        if warp_embed is not None:
            warp_embed = jnp.broadcast_to(
                warp_embed[..., None, :],
                (*batch_shape, warp_embed.shape[-1]))
        if hyper_embed is not None:
            hyper_embed = jnp.broadcast_to(
                hyper_embed[..., None, :],
                (*batch_shape, hyper_embed.shape[-1]))

        warped_points, warp_jacobian = self.map_points(
            points, warp_embed, hyper_embed, extra_params, use_warp=use_warp,
            return_warp_jacobian=return_warp_jacobian,
            hyper_point_override=metadata.get('hyper_point'))

        rgb, sigma = self.query_template(
            level, warped_points, viewdirs, metadata,
            extra_params=extra_params, metadata_encoded=metadata_encoded,
            stratified=stratified)
        sigma = filter_sigma(points, sigma, render_opts)

        if warp_jacobian is not None:
            out['warp_jacobian'] = warp_jacobian
        if return_points:
            out['points'] = points
            out['warped_points'] = warped_points
        out.update(volumetric_rendering(
            rgb, sigma, z_vals, directions,
            use_white_background=cfg.use_white_background,
            sample_at_infinity=use_sample_at_infinity))

        if return_points:
            # The warped point each ray terminates at (median depth).
            depth_indices = compute_depth_index(out['weights'])
            out['med_points'] = jnp.take_along_axis(
                warped_points, depth_indices[..., None, None], axis=-2)
        return out

    def __call__(self,
                 rays_dict: Dict[str, Any],
                 extra_params: Optional[Dict[str, Any]] = None,
                 metadata_encoded: bool = False,
                 use_warp: bool = True,
                 return_points: bool = False,
                 return_weights: bool = True,
                 return_warp_jacobian: bool = False,
                 near=None,
                 far=None,
                 use_sample_at_infinity=None,
                 render_opts=None,
                 deterministic: bool = False,
                 occupancy_grid=None):
        """Render a batch of rays (models.py:673-780).

        Args:
          rays_dict: {'origins': (B,3), 'directions': (B,3),
            'viewdirs': optional (B,3), 'metadata': {key: (B,1)|(B,3)},
            optional per-ray 'near'/'far': (B,)}.
          extra_params: posenc annealing alphas (see DEFAULT_EXTRA_PARAMS).
          metadata_encoded: metadata already contains encoded embeddings.
          use_warp: enable the warp field (if the model has one).
          return_points / return_weights: include heavyweight per-sample
            outputs in the result.
          near / far: overrides (else per-ray values, else config).
          use_sample_at_infinity: override config.
          render_opts: dict for filter_sigma ('dust_threshold'/'bounding_box').
          deterministic: disable stratified sampling and sigma noise (eval).
          occupancy_grid: optional (G, G, G) density grid; with
            config.use_occupancy_grid it reshapes the coarse sampling
            distribution toward occupied space (ops/occupancy.py).

        Returns:
          {'coarse': {...}, 'fine': {...}} with per-ray rgb/depth/med_depth/acc
          (plus weights/points when requested).
        """
        cfg = self.config
        use_warp = cfg.use_warp and use_warp
        extra_params = {**DEFAULT_EXTRA_PARAMS, **(extra_params or {})}

        origins = rays_dict['origins']
        directions = rays_dict['directions']
        metadata = rays_dict['metadata']
        viewdirs = rays_dict.get('viewdirs')
        if viewdirs is None:
            viewdirs = directions

        if near is None:
            near = rays_dict.get('near', cfg.near)
        if far is None:
            far = rays_dict.get('far', cfg.far)
        if use_sample_at_infinity is None:
            use_sample_at_infinity = cfg.use_sample_at_infinity
        stratified = cfg.use_stratified_sampling and not deterministic

        if stratified:
            coarse_key = self.make_rng('sampling')
        else:
            coarse_key = jax.random.PRNGKey(0)  # unused when not stratified
        if cfg.use_occupancy_grid and occupancy_grid is not None:
            from hypernerf_tpu.ops.occupancy import sample_occupancy_rays
            bbox = ((cfg.occupancy_bbox_min,) * 3,
                    (cfg.occupancy_bbox_max,) * 3)
            z_vals, points = sample_occupancy_rays(
                coarse_key, origins, directions, occupancy_grid, bbox,
                cfg.num_coarse_samples, near, far, cfg.occupancy_probes,
                stratified, cfg.occupancy_floor)
        else:
            z_vals, points = sample_along_rays(
                coarse_key, origins, directions, cfg.num_coarse_samples,
                near, far, stratified, cfg.use_linear_disparity)
        # Fused hierarchical sampling: when the coarse level runs the fused
        # compositing kernel, the fine inverse-CDF + union-merge runs INSIDE
        # it (fused_composite fine_samples) — sample_pdf never leaves VMEM.
        # The fine 'sampling' rng is drawn up-front either way (same
        # make_rng order as the XLA path, so keys are identical), and
        # sorted_uniform makes the kernel's u the SAME multiset
        # piecewise_constant_pdf would draw for this key.
        fine_key = None
        fine_u = None
        occupancy_active = (cfg.use_occupancy_grid
                            and occupancy_grid is not None)
        if cfg.num_fine_samples > 0:
            if stratified:
                fine_key = self.make_rng('sampling')
            else:
                fine_key = jax.random.PRNGKey(0)
            # Non-power-of-two totals (the reference-default 64+128) ride
            # the fast path too: the kernel pads its bitonic union-merge
            # with sentinel lanes (fused_composite.CompositeSpec.union_width).
            if (cfg.use_pallas and cfg.use_pallas_level
                    and not occupancy_active and not render_opts
                    and (jax.default_backend() == 'tpu'
                         or cfg.pallas_interpret)
                    and not self.is_initializing()):
                from hypernerf_tpu.ops.sampling import sorted_uniform
                n_rays = directions.shape[0]
                if stratified:
                    fine_u = sorted_uniform(fine_key, n_rays,
                                            cfg.num_fine_samples)
                else:
                    fine_u = jnp.broadcast_to(
                        jnp.linspace(0.0, 1.0, cfg.num_fine_samples),
                        (n_rays, cfg.num_fine_samples))

        coarse_ret = self.render_samples(
            'coarse', points, z_vals, directions, viewdirs, metadata,
            extra_params, use_warp=use_warp,
            metadata_encoded=metadata_encoded,
            return_warp_jacobian=return_warp_jacobian,
            use_sample_at_infinity=cfg.use_sample_at_infinity,
            stratified=stratified,
            return_points=return_points,
            origins=origins,
            fine_u=fine_u)
        out = {'coarse': coarse_ret}

        if cfg.num_fine_samples > 0:
            z_union = coarse_ret.pop('z_union', None)
            if z_union is not None:
                z_vals = z_union
                points = (origins[..., None, :]
                          + z_vals[..., None] * directions[..., None, :])
            else:
                z_vals_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
                fine_weights = coarse_ret['weights'][..., 1:-1]
                if occupancy_active:
                    # Fine budget follows coarse weights AND occupancy:
                    # gate the CDF weights with the grid at the coarse
                    # sample positions so early-training weight noise can't
                    # spend fine samples in known-empty space
                    # (ops/occupancy.gate_fine_weights).
                    from hypernerf_tpu.ops.occupancy import gate_fine_weights
                    bbox = ((cfg.occupancy_bbox_min,) * 3,
                            (cfg.occupancy_bbox_max,) * 3)
                    fine_weights = gate_fine_weights(
                        occupancy_grid, origins, directions,
                        z_vals[..., 1:-1], fine_weights, bbox,
                        cfg.occupancy_floor)
                z_vals, points = sample_pdf(
                    fine_key, z_vals_mid, fine_weights,
                    origins, directions, z_vals, cfg.num_fine_samples,
                    stratified)
            out['fine'] = self.render_samples(
                'fine', points, z_vals, directions, viewdirs, metadata,
                extra_params, use_warp=use_warp,
                metadata_encoded=metadata_encoded,
                return_warp_jacobian=return_warp_jacobian,
                use_sample_at_infinity=use_sample_at_infinity,
                stratified=stratified,
                render_opts=render_opts,
                return_points=return_points,
                origins=origins)

        if not return_weights:
            for level in out:
                out[level].pop('weights', None)
        return out
