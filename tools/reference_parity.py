"""Cross-framework numerical parity harness vs the torch reference.

Loads the PyTorch reference (/root/reference, read-only) on CPU, builds its
``NerfModel`` and this repo's flax ``NerfModel`` with IDENTICAL weights
(transplanted torch -> flax), runs both deterministic forwards on the same
rays, and measures the deviation of every rendered output. This converts the
repo's "0.1 dB parity" claim from asserted to proven: if either implementation
drifts numerically (init topology, compositing eps, CDF edge handling), the
deviation blows past tolerance and tests/test_reference_parity.py fails.

Reference entry points matched:
  * NerfModel.forward            /root/reference/hypernerf/models.py:673-780
  * volumetric_rendering         /root/reference/hypernerf/model_utils.py:43-107
  * sample_pdf / piecewise_constant_pdf  model_utils.py:160-232
  * sample_along_rays            model_utils.py:6-41
  * posenc_orig                  model_utils.py:234-246
  * exp_se3 / rigid body         /root/reference/hypernerf/rigid_body.py

Layout note: this repo's posenc emits BLOCK layout [x | sin f0..fN | cos
f0..fN] while the reference interleaves per band [x | sin f0 | cos f0 | sin
f1 | ...] (model_utils.py:241-245). The two are feature permutations of each
other, absorbed by permuting the input rows of the first dense layer (and of
the skip-concat rows) during weight transplantation -- see
``posenc_orig_perm`` / ``_mlp_to_flax``.

Intended deviations (documented, not bugs):
  * torch ``MLP(depth=0)`` still creates one hidden layer
    (modules.py:99-101: the list always starts with Linear(in, width)), so
    the reference SE3 w/v heads are accidentally 2 layers deep; this repo
    follows the Nerfies design (pure linear heads). SE3 parity is therefore
    checked at the rigid-body math level (exp_se3), not by transplant.
  * The reference's Nerfies ``posenc`` uses sin(x + 0.5*3.1415926)
    (model_utils.py:262) instead of cos(x): a ~3.4e-8 phase error we do not
    replicate.

Run as a CLI for the full report:
    HYPERNERF_PLATFORM=cpu python tools/reference_parity.py
"""

from __future__ import annotations

import os
import sys
import types
from typing import Dict, Optional, Sequence

import numpy as np

REFERENCE_ROOT = '/root/reference'


# --------------------------------------------------------------------------
# Reference loading (CPU-safe)
# --------------------------------------------------------------------------

_REF_CACHE: Dict[str, object] = {}


def load_reference():
    """Import the torch reference with CPU patches applied.

    The reference hardcodes ``.cuda()`` on tensors/modules (rigid_body.py:38,
    model_utils.py:250) and imports ``torchsummary`` (modules.py:21, absent
    here); both are patched before import. Returns a namespace with the
    reference modules and torch.
    """
    if _REF_CACHE:
        return _REF_CACHE['ns']
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if 'torchsummary' not in sys.modules:
        stub = types.ModuleType('torchsummary')
        stub.summary = lambda *a, **k: None
        sys.modules['torchsummary'] = stub
    import torch
    # Route the reference's hardcoded .cuda() calls to the CPU.
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from hypernerf import model_utils as ref_model_utils  # noqa: E402
    from hypernerf import models as ref_models  # noqa: E402
    from hypernerf import modules as ref_modules  # noqa: E402
    from hypernerf import rigid_body as ref_rigid  # noqa: E402
    from hypernerf import warping as ref_warping  # noqa: E402

    # Documented reference bug we do NOT replicate (fixed here so the
    # Nerfies-encoding transplant config compares the intended math): the
    # reference ports jaxnerf's `2**linspace(min, max, F, endpoint=False)`
    # band scales as `2**torch.linspace(min_deg, max_deg, steps=F)`
    # (model_utils.py:258) — torch.linspace always includes the endpoint, so
    # the band exponents come out [0, 10/9, ..., 10] instead of the integer
    # [0, 1, ..., 9] every NeRF codebase (and this repo's ops/posenc.py)
    # uses. The patch keeps everything else byte-identical, including the
    # sin(x + 0.5*3.1415926) phase quirk (~3.4e-8, absorbed by tolerance).
    def _posenc_integer_bands(x, min_deg, max_deg, use_identity=False,
                              alpha=None):
        batch_shape = x.shape[:-1]
        scales = 2.0 ** torch.arange(min_deg, max_deg, device=x.device,
                                     dtype=x.dtype)
        xb = x[..., None, :] * scales[:, None]
        four_feat = torch.sin(torch.stack((xb, xb + 0.5 * 3.1415926),
                                          dim=-2))
        four_feat = four_feat.view((*batch_shape, -1))
        if use_identity:
            return torch.cat([x, four_feat], dim=-1)
        return four_feat

    ref_model_utils.posenc = _posenc_integer_bands
    ns = types.SimpleNamespace(
        torch=torch, models=ref_models, model_utils=ref_model_utils,
        modules=ref_modules, warping=ref_warping, rigid_body=ref_rigid)
    _REF_CACHE['ns'] = ns
    return ns


# --------------------------------------------------------------------------
# Feature-layout permutations (reference interleaved -> this repo's block)
# --------------------------------------------------------------------------

def posenc_orig_perm(channels: int, n_freqs: int) -> np.ndarray:
    """perm[i] = reference feature index of block-layout position i.

    Reference posenc_orig layout (model_utils.py:241-245):
      [x(C) | sin(f0 x)(C) | cos(f0 x)(C) | sin(f1 x)(C) | ...]
    Block layout (ops/posenc.py):
      [x(C) | sin f0..fN-1 (N*C) | cos f0..fN-1 (N*C)]
    """
    c, f = channels, n_freqs
    ident = np.arange(c)
    sin = np.concatenate([c + 2 * k * c + np.arange(c) for k in range(f)])
    cos = np.concatenate([c + (2 * k + 1) * c + np.arange(c)
                          for k in range(f)])
    return np.concatenate([ident, sin, cos])


def posenc_nerfies_perm(channels: int, n_freqs: int,
                        use_identity: bool) -> np.ndarray:
    """Permutation for the Nerfies posenc ((F,2,C) stack, model_utils.py:262)."""
    c, f = channels, n_freqs
    off = c if use_identity else 0
    parts = [np.arange(off)] if use_identity else []
    parts.append(np.concatenate(
        [off + 2 * k * c + np.arange(c) for k in range(f)]))
    parts.append(np.concatenate(
        [off + (2 * k + 1) * c + np.arange(c) for k in range(f)]))
    return np.concatenate(parts)


def cat_perms(segments: Sequence) -> np.ndarray:
    """Concatenate per-segment permutations into one input permutation.

    Each segment is either an int (raw features, identity perm) or a
    permutation array for an encoded segment. Both layouts place segments in
    the same order, so each segment's perm is just offset by the widths of
    the segments before it.
    """
    parts, offset = [], 0
    for seg in segments:
        if isinstance(seg, (int, np.integer)):
            parts.append(offset + np.arange(seg))
            offset += int(seg)
        else:
            seg = np.asarray(seg)
            parts.append(offset + seg)
            offset += seg.shape[0]
    return np.concatenate(parts)


# --------------------------------------------------------------------------
# Weight transplantation: torch state dict -> flax params
# --------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    # Preserve dtype: weights are f32; the gradient transplant runs in f64.
    return t.detach().cpu().numpy()


def _dense_to_flax(sd, key: str) -> Dict[str, np.ndarray]:
    # torch Linear stores (out, in); flax Dense kernels are (in, out).
    return {'kernel': _np(sd[f'{key}.weight']).T,
            'bias': _np(sd[f'{key}.bias'])}


def _mlp_to_flax(sd, prefix: str, depth: int, skips: Sequence[int],
                 in_perm: Optional[np.ndarray]) -> Dict:
    """Map a reference MLP (modules.py:46-127) onto this repo's flax MLP.

    ``in_perm`` permutes the input features of the first layer AND of the
    raw-input rows re-concatenated after each skip layer (modules.py:123-124:
    the skip concatenates the ORIGINAL inputs, consumed by linears[s+1]).
    """
    params = {}
    for i in range(depth):
        layer = _dense_to_flax(sd, f'{prefix}.linears.{i}')
        if in_perm is not None:
            if i == 0:
                layer['kernel'] = layer['kernel'][in_perm, :]
            elif (i - 1) in skips:
                k = layer['kernel']
                width = k.shape[0] - in_perm.shape[0]
                layer['kernel'] = np.concatenate(
                    [k[:width], k[width:][in_perm]], axis=0)
        params[f'hidden_{i}'] = layer
    params['logit'] = _dense_to_flax(sd, f'{prefix}.logit_layer')
    return params


def _embed_to_flax(sd, key: str) -> Dict:
    return {'embed': {'embedding': _np(sd[f'{key}.embed.weight'])}}


def torch_to_flax_params(torch_model, cfg, tensors=None) -> Dict:
    """Build this repo's NerfModel params pytree from reference weights.

    cfg is a hypernerf_tpu.configs.NerfConfig describing BOTH models (the
    torch model must have been constructed with the mirrored flags, see
    ``build_torch_model``).

    ``tensors`` overrides the source dict (default: the model's state_dict).
    Passing per-parameter GRADIENTS here maps them into the flax gradient
    tree — the transplant is a fixed linear reindexing (transposes +
    permutations), so weights and their gradients transform identically.
    """
    sd = torch_model.state_dict() if tensors is None else tensors
    params: Dict = {}

    if cfg.use_warp:
        params['warp_embed'] = _embed_to_flax(sd, 'warp_embed')
        warp_perm = cat_perms(
            [posenc_orig_perm(3, cfg.warp_freq), cfg.glo_dim])
        params['warp_field'] = {'mlp': _mlp_to_flax(
            sd, 'warp_field.mlp', cfg.warp_depth, cfg.skips, warp_perm)}

    if cfg.has_hyper_embed and not cfg.hyper_use_warp_embed:
        params['hyper_embed'] = _embed_to_flax(sd, 'hyper_embed')
    if cfg.hyper_slice_method == 'bendy_sheet':
        sheet_perm = cat_perms(
            [posenc_orig_perm(3, cfg.hyper_sheet_freq), cfg.glo_dim])
        params['hyper_sheet_mlp'] = {'mlp': _mlp_to_flax(
            sd, 'hyper_sheet_mlp.mlp', cfg.hyper_sheet_depth, cfg.skips,
            sheet_perm)}

    if cfg.use_nerf_embed and not cfg.nerf_use_warp_embed:
        params['nerf_embed'] = _embed_to_flax(sd, 'nerf_embed')

    # Template trunk input: posenc(xyz) [++ posenc(hyper)] (models.py:457-478;
    # Nerfies path: identity on spatial only, models.py:461-476).
    hyper_dim = (cfg.hyper_slice_out_dim
                 if cfg.hyper_slice_method == 'bendy_sheet'
                 else cfg.glo_dim)
    if cfg.use_original_embed:
        trunk_segments = [posenc_orig_perm(3, cfg.xyz_freq)]
        if cfg.use_warp and cfg.has_hyper:
            trunk_segments.append(posenc_orig_perm(hyper_dim, cfg.hyper_freq))
        view_perm = posenc_orig_perm(3, cfg.dir_freq)
    else:
        trunk_segments = [posenc_nerfies_perm(
            3, cfg.spatial_point_max_deg - cfg.spatial_point_min_deg,
            use_identity=True)]
        if cfg.use_warp and cfg.has_hyper:
            trunk_segments.append(posenc_nerfies_perm(
                hyper_dim, cfg.hyper_point_max_deg - cfg.hyper_point_min_deg,
                use_identity=False))
        view_perm = posenc_nerfies_perm(
            3, cfg.viewdir_max_deg - cfg.viewdir_min_deg, use_identity=True)
    trunk_perm = cat_perms(trunk_segments)

    # rgb branch input: bottleneck ++ posenc(viewdirs) [++ nerf embed]
    # (models.py:404-445, modules.py:290-296).
    rgb_segments = [cfg.trunk_width // 2, view_perm]
    if cfg.use_nerf_embed and cfg.use_rgb_condition:
        rgb_segments.append(cfg.glo_dim)
    rgb_perm = cat_perms(rgb_segments)

    for level, tname in (('nerf_coarse', 'nerf_mlps_coarse'),
                         ('nerf_fine', 'nerf_mlps_fine')):
        if level == 'nerf_fine' and cfg.num_fine_samples <= 0:
            continue
        params[level] = {
            'trunk': _mlp_to_flax(sd, f'{tname}.trunk_mlp', cfg.trunk_depth,
                                  cfg.skips, trunk_perm),
            'bottleneck': _dense_to_flax(sd, f'{tname}.bottleneck_mlp'),
            'alpha_head': _dense_to_flax(sd, f'{tname}.alpha_mlp'),
            'rgb_branch': _mlp_to_flax(sd, f'{tname}.rgb_mlp',
                                       cfg.rgb_branch_depth, cfg.skips,
                                       rgb_perm),
        }
    return params


# --------------------------------------------------------------------------
# Paired model construction + forward
# --------------------------------------------------------------------------

def build_torch_model(cfg, deterministic: bool = True, seed: int = 0):
    """Construct the reference NerfModel mirroring a NerfConfig.

    Mirrors NeRFSystem's construction (train.py:48-67) but with the
    embeddings_dict sized from cfg.num_embeddings instead of the hardcoded
    NUM_IMG=100 (train.py:42).

    ``seed`` pins torch's global RNG before the init draws: without it every
    process gets different weights, and the measured deviation (which sits
    on the conditioning floor of the exp/cumprod compositing chain, see
    run_grad_pair) varies run to run.
    """
    ref = load_reference()
    ref.torch.manual_seed(seed)
    ids = list(range(cfg.num_embeddings))
    embeddings_dict = {'warp': ids, 'camera': [0], 'appearance': ids,
                       'time': ids}
    slice_method = (None if cfg.hyper_slice_method == 'none'
                    else cfg.hyper_slice_method)
    model_cls = ref.models.NerfModel
    if not cfg.use_original_embed:
        # The reference hardcodes use_original_embed=True inside __init__
        # (models.py:204) before the Nerfies channel computation at :239.
        # A data-descriptor property swallows that assignment and pins the
        # flag False for the whole construction + forward, activating the
        # reference's own Nerfies posenc path (models.py:239-257, :457-478).
        # That branch also never assigns nerf_cond_ch_rgb (models.py:245-249
        # computes viewdir_feat_ch but drops it — dead-code bug), so the
        # viewdir condition width is supplied here: Nerfies posenc with
        # identity over hardcoded degs 0..4 (models.py:155-157) [+ GLO].
        rgb_cond_ch = 3 * (1 + 2 * 4)
        if cfg.use_nerf_embed and cfg.use_rgb_condition:
            rgb_cond_ch += cfg.glo_dim

        class _NerfiesNerfModel(ref.models.NerfModel):
            use_original_embed = property(lambda self: False,
                                          lambda self, value: None)
            nerf_cond_ch_rgb = property(lambda self: rgb_cond_ch,
                                        lambda self, value: None)
        model_cls = _NerfiesNerfModel
    model = model_cls(
        embeddings_dict,
        near=cfg.near, far=cfg.far,
        n_samples_coarse=cfg.num_coarse_samples,
        n_samples_fine=cfg.num_fine_samples,
        noise_std=None if deterministic else cfg.noise_std,
        use_warp=cfg.use_warp,
        use_nerf_embed=cfg.use_nerf_embed,
        use_alpha_cond=cfg.use_alpha_condition,
        use_rgb_cond=cfg.use_rgb_condition,
        hyper_slice_method=slice_method,
        hyper_slice_out_dim=cfg.hyper_slice_out_dim,
        GLO_dim=cfg.glo_dim,
        share_GLO=cfg.share_glo,
        xyz_fourier_dim=cfg.xyz_freq,
        hyper_fourier_dim=cfg.hyper_freq,
        view_fourier_dim=cfg.dir_freq,
    )
    model.eval()
    if deterministic:
        # The reference hardcodes stratified sampling on (models.py:146);
        # turning it off makes sample_along_rays/piecewise_constant_pdf/
        # noise_regularize fully deterministic (model_utils.py:30/183/312).
        model.use_stratified_sampling = False
    return model


def make_ray_batch(n_rays: int, num_embeddings: int, seed: int = 0):
    """A shared random ray batch as plain numpy (unit directions, ids)."""
    rng = np.random.RandomState(seed)
    origins = rng.uniform(-0.5, 0.5, (n_rays, 3)).astype(np.float32)
    directions = rng.normal(size=(n_rays, 3)).astype(np.float32)
    directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
    ids = rng.randint(0, num_embeddings, (n_rays, 1)).astype(np.int64)
    return origins, directions, ids


def run_torch_forward(model, origins, directions, ids):
    ref = load_reference()
    torch = ref.torch
    idx = torch.from_numpy(ids)
    rays_dict = {
        'origins': torch.from_numpy(origins),
        'directions': torch.from_numpy(directions),
        'viewdirs': None,
        'metadata': {k: idx.clone()
                     for k in ('warp', 'camera', 'appearance', 'time')},
    }
    extra = {'nerf_alpha': None, 'warp_alpha': None, 'hyper_alpha': None,
             'hyper_sheet_alpha': None}
    with torch.no_grad():
        out = model(rays_dict, extra)
    return {level: {k: _np(v) for k, v in level_out.items()}
            for level, level_out in out.items()}


def run_jax_forward(cfg, params, origins, directions, ids):
    import jax
    import jax.numpy as jnp

    from hypernerf_tpu.models.nerf import NerfModel

    model = NerfModel(cfg)
    rays_dict = {
        'origins': jnp.asarray(origins),
        'directions': jnp.asarray(directions),
        'viewdirs': None,
        'metadata': {k: jnp.asarray(ids.astype(np.int32))
                     for k in ('warp', 'camera', 'appearance', 'time')},
    }
    out = model.apply({'params': params}, rays_dict, deterministic=True)
    return jax.tree_util.tree_map(np.asarray, out)


FORWARD_KEYS = ('rgb', 'depth', 'med_depth', 'acc', 'weights')

# med_depth is the z of the sample where cumulative weight crosses 0.5
# (model_utils.py:319-362) -- an inherently discontinuous output. When a
# ray's cumsum sits within float noise of the threshold, a ~1e-7 weight
# difference legitimately flips the chosen sample (one bin of z). Such
# knife-edge rays are excluded from the med_depth comparison only.
MED_DEPTH_KNIFE_EDGE_EPS = 1e-5


def forward_deviations(torch_out, jax_out) -> Dict[str, float]:
    """Max |torch - jax| for each rendered output, per level."""
    devs = {}
    for level in jax_out:
        for k in FORWARD_KEYS:
            if k not in torch_out[level] or k not in jax_out[level]:
                continue
            diff = np.abs(torch_out[level][k] - jax_out[level][k])
            if k == 'med_depth':
                cum = np.cumsum(torch_out[level]['weights'], axis=-1)
                stable = (np.min(np.abs(cum - 0.5), axis=-1)
                          > MED_DEPTH_KNIFE_EDGE_EPS)
                diff = diff[stable] if stable.any() else diff * 0.0
            devs[f'{level}/{k}'] = float(np.max(diff)) if diff.size else 0.0
    return devs


def run_forward_pair(cfg, n_rays: int = 8, seed: int = 0):
    """Build both models, transplant weights, run both, return deviations."""
    import jax

    from hypernerf_tpu.models.nerf import NerfModel

    tm = build_torch_model(cfg, deterministic=True)
    params = torch_to_flax_params(tm, cfg)

    # Structural check: the transplanted tree must match a fresh init
    # leaf-for-leaf (shapes), so a topology drift fails loudly here.
    origins, directions, ids = make_ray_batch(n_rays, cfg.num_embeddings,
                                              seed)
    import jax.numpy as jnp
    model = NerfModel(cfg)
    rd = {'origins': jnp.asarray(origins),
          'directions': jnp.asarray(directions), 'viewdirs': None,
          'metadata': {k: jnp.asarray(ids.astype(np.int32))
                       for k in ('warp', 'camera', 'appearance', 'time')}}
    ref_params = model.init({'params': jax.random.PRNGKey(0)}, rd,
                            deterministic=True)['params']
    ref_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), ref_params)
    got_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), params)
    if ref_shapes != got_shapes:
        raise AssertionError(
            f'Transplanted tree does not match model structure:\n'
            f'model: {ref_shapes}\ntransplant: {got_shapes}')

    torch_out = run_torch_forward(tm, origins, directions, ids)
    jax_out = run_jax_forward(cfg, params, origins, directions, ids)
    return forward_deviations(torch_out, jax_out)


# --------------------------------------------------------------------------
# Gradient-level parity: torch autograd vs jax.grad on the same MSE batch
# --------------------------------------------------------------------------

def _flatten_tree(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        path = f'{prefix}/{k}' if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_tree(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def run_grad_pair(cfg, n_rays: int = 8, seed: int = 0) -> Dict[str, float]:
    """Per-parameter gradient deviation between the two frameworks.

    Both sides compute the reference training loss — MSE(coarse rgb) +
    MSE(fine rgb) against the same random targets
    (/root/reference/train.py:147-163, losses.py:9-14) — on the identical
    transplanted weights and ray batch; torch autograd's parameter gradients
    are mapped into the flax tree through the SAME permutations as the
    weights and compared to ``jax.grad``. This is what guarantees the two
    frameworks TRAIN identically, not just render identically: a silent
    sign/permutation error in any custom VJP shows up here even when the
    forward agrees.

    Precision note: the comparison runs in FLOAT64 on both sides (torch
    ``.double()``; jax ``enable_x64`` + compute_dtype float64). At f32 the
    element-max deviation is dominated by conditioning noise, not math:
    torch's OWN f32 grads deviate from its f64 grads by ~1.2e-3 (the
    volume-rendering exp() chain amplifies last-bit differences), so only
    the f64 comparison can resolve a genuine sub-1e-4 disagreement. The
    residual ~2e-5 measured here traces to this repo's deliberate fp32
    activation casts at the rgb/alpha heads (models/nerf.py:245-253).

    Returns {param_path: relative max deviation}.
    """
    import dataclasses

    import jax

    from hypernerf_tpu.models.nerf import NerfModel

    ref = load_reference()
    torch = ref.torch

    tm = build_torch_model(cfg, deterministic=True)
    params32 = torch_to_flax_params(tm, cfg)
    origins, directions, ids = make_ray_batch(n_rays, cfg.num_embeddings,
                                              seed)
    targets = np.random.RandomState(seed + 1).uniform(
        0, 1, (n_rays, 3)).astype(np.float32)

    # ---- torch side: f64 loss.backward() through the full model.
    # .double() converts parameters, but in-forward constants
    # (torch.linspace in sample_along_rays / the CDF u's) follow the GLOBAL
    # default dtype — left at f32 they quantize the sample depths and put
    # ~5e-7 of noise into the trunk grads (amplified by the 2^9 posenc
    # bands), so the default dtype must be f64 for the duration.
    tm.double()
    old_default = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        idx = torch.from_numpy(ids)
        rays_dict = {
            'origins': torch.from_numpy(origins).double(),
            'directions': torch.from_numpy(directions).double(),
            'viewdirs': None,
            'metadata': {k: idx.clone()
                         for k in ('warp', 'camera', 'appearance', 'time')},
        }
        extra = {'nerf_alpha': None, 'warp_alpha': None, 'hyper_alpha': None,
                 'hyper_sheet_alpha': None}
        tm.zero_grad()
        out = tm(rays_dict, extra)
        t_targets = torch.from_numpy(targets).double()
        loss = torch.mean((out['coarse']['rgb'] - t_targets) ** 2)
        if 'fine' in out:
            loss = loss + torch.mean((out['fine']['rgb'] - t_targets) ** 2)
        torch_rgb = {lv: out[lv]['rgb'].detach().cpu().numpy()
                     for lv in out if 'rgb' in out[lv]}
        loss.backward()
    finally:
        torch.set_default_dtype(old_default)
    grad_sd = {name: (p.grad if p.grad is not None
                      else torch.zeros_like(p))
               for name, p in tm.named_parameters()}
    torch_grads = torch_to_flax_params(tm, cfg, tensors=grad_sd)

    # ---- jax side: jax.grad of the same loss at f64.
    cfg64 = dataclasses.replace(cfg, compute_dtype='float64')
    with jax.enable_x64(True):
        import jax.numpy as jnp
        params = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), params32)
        model = NerfModel(cfg64)
        jrd = {'origins': jnp.asarray(origins, jnp.float64),
               'directions': jnp.asarray(directions, jnp.float64),
               'viewdirs': None,
               'metadata': {k: jnp.asarray(ids.astype(np.int32))
                            for k in ('warp', 'camera', 'appearance', 'time')}}
        j_targets = jnp.asarray(targets, jnp.float64)

        def loss_fn(p):
            res = model.apply({'params': p}, jrd, deterministic=True)
            l = jnp.mean((res['coarse']['rgb'] - j_targets) ** 2)
            if 'fine' in res:
                l = l + jnp.mean((res['fine']['rgb'] - j_targets) ** 2)
            return l, res

        jax_grads, jax_res = jax.grad(loss_fn, has_aux=True)(params)
        jax_grads = jax.tree.map(np.asarray, jax_grads)
        jax_rgb = {lv: np.asarray(jax_res[lv]['rgb']) for lv in jax_res}

    t_flat = _flatten_tree(torch_grads)
    j_flat = _flatten_tree(jax_grads)
    assert set(t_flat) == set(j_flat), (
        set(t_flat) ^ set(j_flat))
    devs = {}
    for k in sorted(t_flat):
        gt, gj = t_flat[k], j_flat[k]
        scale = max(np.abs(gt).max(), np.abs(gj).max(), 1e-12)
        devs[k] = float(np.abs(gt - gj).max() / scale)
    # Diagnostic: same-weights forward agreement. A fine-rgb deviation here
    # with passing per-level grads points at a CDF-inversion bin flip
    # (knife-edge u == cdf tie), not a backward bug.
    for lv in torch_rgb:
        devs[f'_forward/{lv}_rgb'] = float(
            np.abs(torch_rgb[lv] - jax_rgb[lv]).max())
    return devs


# --------------------------------------------------------------------------
# The three parity configs (BASELINE.json model families)
# --------------------------------------------------------------------------

def parity_configs():
    from hypernerf_tpu.configs import NerfConfig
    common = dict(
        num_embeddings=5,
        num_coarse_samples=16, num_fine_samples=16,
        noise_std=None,
        compute_dtype='float32',
        use_pallas=False, use_pallas_fields=False, use_pallas_level=False,
    )
    return {
        'static': NerfConfig(use_warp=False, hyper_slice_method='none',
                             **common),
        'translation+bendy_sheet': NerfConfig(
            use_warp=True, hyper_slice_method='bendy_sheet', **common),
        # The reference's template in_ch assumes hyper dim ==
        # hyper_slice_out_dim (models.py:268); for axis_aligned_plane the
        # hyper coords are the GLO embedding, so glo_dim must equal
        # hyper_slice_out_dim for the reference itself to be shape-consistent.
        'axis_aligned_plane': NerfConfig(
            use_warp=True, hyper_slice_method='axis_aligned_plane',
            glo_dim=4, hyper_slice_out_dim=4, **common),
        # The reference's OWN Nerfies posenc path (models.py:239-257,
        # :457-478; window disabled, alphas=None) — transplantable after the
        # integer-band-scale patch in load_reference. Proves the anneal
        # mode's BASE function is reference-consistent, not just
        # self-consistent.
        'nerfies_encoding': NerfConfig(
            use_warp=True, hyper_slice_method='bendy_sheet',
            use_original_embed=False, **common),
    }


def main():
    os.environ.setdefault('HYPERNERF_PLATFORM', 'cpu')
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    from hypernerf_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()

    print('Cross-framework parity: torch reference vs hypernerf_tpu (fp32, '
          'CPU, transplanted weights, deterministic forward)')
    worst = 0.0
    for name, cfg in parity_configs().items():
        devs = run_forward_pair(cfg, n_rays=16, seed=0)
        worst = max(worst, max(devs.values()))
        print(f'\n[{name}]')
        for k, v in sorted(devs.items()):
            print(f'  {k:<18} max|Δ| = {v:.3e}')
    print(f'\nWorst forward deviation across all configs/outputs: {worst:.3e}')

    print('\nGradient parity: torch autograd vs jax.grad on the shared MSE '
          'batch (relative per-parameter deviation)')
    worst_grad = 0.0
    for name, cfg in parity_configs().items():
        devs = run_grad_pair(cfg, n_rays=16, seed=0)
        worst_cfg = max(devs.values())
        worst_grad = max(worst_grad, worst_cfg)
        top = sorted(devs.items(), key=lambda kv: -kv[1])[:3]
        print(f'  [{name}] worst rel dev = {worst_cfg:.3e}  '
              f'({", ".join(f"{k}={v:.1e}" for k, v in top)})')
    print(f'\nWorst gradient deviation across all configs: {worst_grad:.3e}')
    if worst > 1e-4 or worst_grad > 1e-4:
        print('FAIL: deviation exceeds 1e-4')
        sys.exit(1)
    print('PASS: all forwards and gradients agree within 1e-4')


if __name__ == '__main__':
    main()
