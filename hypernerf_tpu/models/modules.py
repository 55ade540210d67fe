"""Neural modules: skip-MLP, NeRF template MLP, GLO embeddings, hyper-sheet.

Capability parity with /root/reference/hypernerf/modules.py, rebuilt as flax
modules. Key deliberate matches with the reference:

* ``MLP`` applies the skip concat *after* layer i's activation
  (modules.py:116-127), so the layer after a skip sees width+in_ch features.
* Init schemes: Xavier-uniform hidden layers (modules.py:105-109),
  per-module output inits (uniform 1e-4 warp, normal 1e-5 hyper-sheet,
  normal 0.1/dim GLO).
* ``NerfMLP``: trunk (8x256, ReLU output) -> bottleneck Dense 256->128
  (modules.py:232) -> alpha head Dense(128+cond -> 1) and rgb branch
  MLP(128+cond -> 3, depth 4, width 128) (modules.py:235-251), with per-ray
  conditions broadcast across samples (modules.py:254-264).

TPU-first deviations: channel counts are inferred lazily by flax (no CUDA
shape probes); matmuls run in a configurable compute dtype (bf16 by default)
with fp32 params; raw rgb/alpha are returned unactivated so the model can
apply sigmoid/softplus in fp32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hypernerf_tpu.ops.posenc import posenc_orig

Dtype = Any


def torch_linear_bias(fan_in: int) -> Callable:
    """torch nn.Linear's DEFAULT bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in)).

    The reference re-initializes only the WEIGHTS of its layers
    (modules.py:105-109 loops over ``linear.weight``); every bias keeps
    torch's default. Replicated here because init distributions are part of
    the training semantics — with zero biases instead, the same-data
    head-to-head (tools/reference_on_synthetic.py) trains measurably
    differently.
    """
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """torch nn.Linear's DEFAULT weight init: kaiming_uniform(a=sqrt(5)),
    which reduces to U(-1/sqrt(fan_in), +1/sqrt(fan_in)).

    Used where the reference constructs a bare nn.Linear without re-init
    (the bottleneck, modules.py:232). flax kernels are (in, out), so
    fan_in = shape[0].
    """
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MLP(nn.Module):
    """Multi-layer perceptron with post-activation skip concatenation.

    Attributes:
      out_ch: output channels of the final (logit) layer.
      depth: number of hidden layers (excluding the logit layer).
      width: hidden width.
      hidden_init / output_init: kernel initializers.
      hidden_activation / output_activation: activations.
      skips: hidden-layer indices after which the raw input is concatenated.
    """
    out_ch: int
    depth: int = 8
    width: int = 256
    hidden_init: Callable = nn.initializers.xavier_uniform()
    output_init: Optional[Callable] = None
    hidden_activation: Callable = nn.relu
    output_activation: Optional[Callable] = None
    use_bias: bool = True
    skips: Tuple[int, ...] = (4,)
    dtype: Dtype = jnp.float32
    # Biases follow torch nn.Linear's default U(+-1/sqrt(fan_in)) — the
    # reference re-inits weights only (see torch_linear_bias). Zero-bias
    # opt-out exists for beyond-reference modules that need exact
    # near-identity init (the SE(3)/quaternion w/v heads).
    torch_default_bias: bool = True

    def _bias_init(self, fan_in: int) -> Callable:
        if self.torch_default_bias:
            return torch_linear_bias(fan_in)
        return nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        inputs = x
        for i in range(self.depth):
            x = nn.Dense(self.width,
                         use_bias=self.use_bias,
                         kernel_init=self.hidden_init,
                         bias_init=self._bias_init(x.shape[-1]),
                         dtype=self.dtype,
                         param_dtype=jnp.float32,
                         name=f'hidden_{i}')(x)
            x = self.hidden_activation(x)
            if i in self.skips:
                x = jnp.concatenate([x, inputs], axis=-1)
        x = nn.Dense(self.out_ch,
                     use_bias=self.use_bias,
                     kernel_init=self.output_init or self.hidden_init,
                     bias_init=self._bias_init(x.shape[-1]),
                     dtype=self.dtype,
                     param_dtype=jnp.float32,
                     name='logit')(x)
        if self.output_activation is not None:
            x = self.output_activation(x)
        return x


class GLOEmbed(nn.Module):
    """Per-frame latent codes: a thin wrapper around nn.Embed.

    Matches modules.py:131-167: init normal with std 0.1/dim, squeezes a
    trailing singleton index dim.
    """
    num_embeddings: int
    features: int = 8

    @nn.compact
    def __call__(self, inputs):
        if inputs.shape and inputs.shape[-1] == 1:
            inputs = jnp.squeeze(inputs, axis=-1)
        embed = nn.Embed(
            num_embeddings=self.num_embeddings,
            features=self.features,
            embedding_init=nn.initializers.normal(stddev=0.1 / self.features),
            name='embed')
        # Clip ids into range: XLA out-of-bounds gathers fill with NaN
        # silently (torch would raise); clipping fails loud-enough in tests
        # while keeping the jitted path total.
        idx = jnp.clip(inputs.astype(jnp.int32), 0, self.num_embeddings - 1)
        return embed(idx)


class NerfMLP(nn.Module):
    """The NeRF template MLP: trunk -> bottleneck -> {alpha head, rgb branch}.

    Returns raw (unactivated) rgb logits and alpha; the caller applies
    sigmoid/softplus (and sigma noise) in fp32.

    With ``use_pallas`` on a TPU backend, evaluation runs through the fused
    Pallas kernel (ops/pallas/fused_mlp.py): all weights VMEM-resident,
    activations never touch HBM, recompute-based backward. The Dense path
    below remains the init path, the CPU path, and the parity reference.
    """
    trunk_depth: int = 8
    trunk_width: int = 256
    rgb_branch_depth: int = 4
    rgb_branch_width: int = 128
    rgb_channels: int = 3
    alpha_channels: int = 1
    skips: Tuple[int, ...] = (4,)
    hidden_activation: Callable = nn.relu
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    pallas_tile: int = 512
    pallas_interpret: bool = False

    def _pallas_path(self, x, alpha_condition, rgb_condition):
        import jax

        from hypernerf_tpu.ops.pallas.fused_mlp import (FusedMLPSpec,
                                                        fused_nerf_mlp,
                                                        nerf_mlp_params_to_list)
        batch_shape = x.shape[:-1]
        x_flat = x.reshape(-1, x.shape[-1])

        def flat_cond(c):
            c = jnp.broadcast_to(c[..., None, :],
                                 (*batch_shape, c.shape[-1]))
            return c.reshape(-1, c.shape[-1])

        rgbc_flat = flat_cond(rgb_condition)
        alphac_flat = (flat_cond(alpha_condition)
                       if alpha_condition is not None else None)
        spec = FusedMLPSpec(
            in_ch=x.shape[-1],
            trunk_depth=self.trunk_depth,
            trunk_width=self.trunk_width,
            rgb_depth=self.rgb_branch_depth,
            rgb_width=self.rgb_branch_width,
            rgb_channels=self.rgb_channels,
            alpha_channels=self.alpha_channels,
            skips=tuple(self.skips),
            rgb_cond_ch=rgb_condition.shape[-1],
            alpha_cond_ch=(alpha_condition.shape[-1]
                           if alpha_condition is not None else 0),
            tile=self.pallas_tile,
            bwd_tile=min(self.pallas_tile, 512),
            compute_dtype=str(jnp.dtype(self.dtype)),
            interpret=self.pallas_interpret,
        )
        pairs = nerf_mlp_params_to_list(self.variables['params'])
        out = fused_nerf_mlp(spec, x_flat, rgbc_flat, alphac_flat, pairs)
        return {'rgb': out['rgb'].reshape(*batch_shape, self.rgb_channels),
                'alpha': out['alpha'].reshape(*batch_shape,
                                              self.alpha_channels)}

    @nn.compact
    def __call__(self, x, alpha_condition=None, rgb_condition=None):
        """Evaluate the template.

        Args:
          x: (B, S, F) encoded sample features.
          alpha_condition: optional (B, Ca) per-ray condition for the density.
          rgb_condition: optional (B, Cr) per-ray condition for the color.

        Returns:
          {'rgb': (B, S, 3) raw logits, 'alpha': (B, S, 1) raw density}.
        """
        import jax as _jax
        if (self.use_pallas and not self.is_initializing()
                and rgb_condition is not None
                and (_jax.default_backend() == 'tpu'
                     or self.pallas_interpret)):
            return self._pallas_path(x, alpha_condition, rgb_condition)
        num_samples = x.shape[-2]

        def broadcast_condition(c):
            # (B, C) -> (B, S, C): every sample on a ray shares the condition.
            if c.ndim == x.ndim - 1:
                c = c[..., None, :]
            return jnp.broadcast_to(c, (*x.shape[:-1], c.shape[-1]))

        trunk = MLP(out_ch=self.trunk_width,
                    depth=self.trunk_depth,
                    width=self.trunk_width,
                    hidden_activation=self.hidden_activation,
                    output_activation=self.hidden_activation,
                    skips=self.skips,
                    dtype=self.dtype,
                    name='trunk')(x)
        # The reference's bottleneck is a bare nn.Linear with torch defaults
        # (modules.py:232) — kaiming_uniform(a=sqrt(5)) weight + default bias.
        bottleneck = nn.Dense(self.trunk_width // 2,
                              kernel_init=torch_linear_kernel,
                              bias_init=torch_linear_bias(self.trunk_width),
                              dtype=self.dtype,
                              param_dtype=jnp.float32,
                              name='bottleneck')(trunk)

        if alpha_condition is not None:
            alpha_input = jnp.concatenate(
                [bottleneck, broadcast_condition(alpha_condition).astype(bottleneck.dtype)],
                axis=-1)
        else:
            alpha_input = bottleneck
        alpha = nn.Dense(self.alpha_channels,
                         kernel_init=nn.initializers.xavier_uniform(),
                         bias_init=torch_linear_bias(alpha_input.shape[-1]),
                         dtype=self.dtype,
                         param_dtype=jnp.float32,
                         name='alpha_head')(alpha_input)

        if rgb_condition is not None:
            rgb_input = jnp.concatenate(
                [bottleneck, broadcast_condition(rgb_condition).astype(bottleneck.dtype)],
                axis=-1)
        else:
            rgb_input = bottleneck
        rgb = MLP(out_ch=self.rgb_channels,
                  depth=self.rgb_branch_depth,
                  width=self.rgb_branch_width,
                  hidden_activation=self.hidden_activation,
                  skips=self.skips,
                  dtype=self.dtype,
                  name='rgb_branch')(rgb_input)

        return {'rgb': rgb, 'alpha': alpha}


class HyperSheetMLP(nn.Module):
    """The 'bendy sheet' slicing MLP mapping (point, embed) -> hyper coords.

    Matches modules.py:302-337: posenc_orig(points, 7 freqs) ++ warp embed ->
    MLP depth 6, width 64, skips (4,), output init normal std=1e-5, optional
    +embed residual. With ``use_pallas`` on TPU, posenc+MLP run as one fused
    kernel (ops/pallas/fused_field.py).
    """
    out_ch: int = 4
    depth: int = 6
    width: int = 64
    n_freq: int = 7
    skips: Tuple[int, ...] = (4,)
    use_residual: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    pallas_tile: int = 1024
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, points, embed, alpha=None):
        import jax as _jax
        if (self.use_pallas and not self.is_initializing()
                and (_jax.default_backend() == 'tpu'
                     or self.pallas_interpret)):
            from hypernerf_tpu.ops.pallas.fused_field import (
                FusedFieldSpec, fused_field_mlp, mlp_params_to_list)
            spec = FusedFieldSpec(
                segments=((points.shape[-1], self.n_freq),
                          (embed.shape[-1], 0)),
                depth=self.depth, width=self.width, out_ch=self.out_ch,
                skips=tuple(self.skips), tile=self.pallas_tile,
                compute_dtype=str(jnp.dtype(self.dtype)),
                interpret=self.pallas_interpret)
            raw = jnp.concatenate(
                [points, embed.astype(points.dtype)], axis=-1)
            out = fused_field_mlp(
                spec, raw.reshape(-1, raw.shape[-1]),
                mlp_params_to_list(self.variables['params']['mlp']))
            out = out.reshape(*points.shape[:-1], self.out_ch)
            if self.use_residual:
                return out + embed
            return out
        points_feat = posenc_orig(points, self.n_freq)
        inputs = jnp.concatenate([points_feat, embed], axis=-1)
        out = MLP(out_ch=self.out_ch,
                  depth=self.depth,
                  width=self.width,
                  output_init=nn.initializers.normal(stddev=1e-5),
                  skips=self.skips,
                  dtype=self.dtype,
                  name='mlp')(inputs)
        if self.use_residual:
            return out + embed
        return out
