"""Train state and the sharded, jit-compiled train step.

This replaces the reference's PyTorch-Lightning training loop
(/root/reference/train.py:35-163) with the TPU-native shape:

* The ENTIRE dataset (all rays + rgbs, tens of MB) lives in HBM, replicated
  on every chip. There is no input pipeline in the hot path — each device
  draws its own random ray batch indices *inside* the jitted step (the
  reference shuffles via DataLoader workers + per-batch H2D copies,
  train.py:133-138).
* One ``shard_map`` over a 1-D ``('data',)`` mesh: per-device forward/backward
  on batch_size/n_devices rays, gradients ``lax.pmean``-ed over ICI,
  identical optimizer update on every device (the fairscale ddp_sharded
  equivalent, train.py:229).
* Stochasticity is decorrelated across devices and steps by folding the
  step count and the mesh axis index into the base PRNG key.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from hypernerf_tpu.configs import NerfConfig, TrainConfig
from hypernerf_tpu.models.nerf import NerfModel
from hypernerf_tpu.ops.ray_dict import prepare_ray_dict
from hypernerf_tpu.parallel.mesh import DATA_AXIS
from hypernerf_tpu.training.losses import loss_dict


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # Optional (G, G, G) occupancy-grid density EMA (None unless
    # NerfConfig.use_occupancy_grid; refreshed by make_occupancy_update).
    occupancy: Any = None


def forward_params(params):
    """Parameters the forward pass should use (lookahead keeps fast/slow)."""
    if isinstance(params, optax.LookaheadParams):
        return params.fast
    return params


def compute_extra_params(nerf_cfg: NerfConfig, train_cfg: TrainConfig, step):
    """Posenc annealing alphas as a function of the global step.

    Only active with the Nerfies encoding (use_original_embed=False); each
    alpha ramps linearly from 0 to its number of frequency bands — the
    coarse-to-fine schedule the reference plumbs but never enables
    (train.py:102-107 passes all None).
    """
    if nerf_cfg.use_original_embed:
        return {}
    step = jnp.asarray(step, jnp.float32)
    warp_bands = nerf_cfg.warp_max_deg - nerf_cfg.warp_min_deg
    hyper_bands = nerf_cfg.hyper_point_max_deg - nerf_cfg.hyper_point_min_deg
    nerf_bands = (nerf_cfg.spatial_point_max_deg
                  - nerf_cfg.spatial_point_min_deg)
    warp_alpha = jnp.minimum(
        step / max(1, train_cfg.warp_alpha_steps), 1.0) * warp_bands
    hyper_alpha = jnp.minimum(
        step / max(1, train_cfg.hyper_alpha_steps), 1.0) * hyper_bands
    return {
        'nerf_alpha': jnp.float32(nerf_bands),  # spatial bands fully on
        'warp_alpha': warp_alpha,
        'hyper_alpha': hyper_alpha,
        'hyper_sheet_alpha': hyper_alpha,
    }


def create_train_state(model: NerfModel, tx: optax.GradientTransformation,
                       train_cfg: TrainConfig, rng,
                       sample_rays) -> TrainState:
    """Initialize parameters and optimizer state from a (tiny) sample batch."""
    rays_dict = prepare_ray_dict(jnp.asarray(sample_rays))
    init_rngs = {'params': rng, 'sampling': rng, 'sigma_noise': rng}
    variables = model.init(init_rngs, rays_dict)
    params = variables['params']
    if train_cfg.optimizer == 'ranger':
        params = optax.LookaheadParams.init_synced(params)
    opt_state = tx.init(params)
    occupancy = None
    if model.config.use_occupancy_grid:
        from hypernerf_tpu.ops.occupancy import init_grid
        occupancy = init_grid(model.config.occupancy_resolution)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, occupancy=occupancy)


def _zero1_sharding(mesh, leaf):
    """NamedSharding partitioning ``leaf`` dim 0 over the data axis when
    divisible (ZeRO-1 moment placement); replicated otherwise (scalar
    counts, odd-sized leaves like the (num_frames, D) GLO embeddings)."""
    from jax.sharding import NamedSharding
    n = mesh.devices.size
    ndim = getattr(leaf, 'ndim', 0)
    if ndim >= 1 and leaf.shape[0] and leaf.shape[0] % n == 0:
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
    return NamedSharding(mesh, P())


def shard_opt_state(mesh, opt_state):
    """Constrain every optimizer-state leaf to its ZeRO-1 sharding."""
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, _zero1_sharding(mesh, x)), opt_state)


def make_train_step(model: NerfModel, tx: optax.GradientTransformation,
                    nerf_cfg: NerfConfig, train_cfg: TrainConfig, mesh,
                    explicit_batch: bool = False, background_points=None):
    """Build the jitted, shard_map'd train step.

    Returns step_fn(state, all_rays, all_rgbs, base_rng) -> (state, metrics).
    ``all_rays``/``all_rgbs`` are the full replicated dataset buffers; each
    device samples its own batch slice on device.

    With ``explicit_batch=True`` the rays/rgbs arguments ARE the global
    batch, sharded over the mesh's data axis (no in-kernel draw). Because
    the per-device loss is a mean over an equal shard, ``lax.pmean`` makes
    the update identical to a single-device step on the same global batch —
    the ddp_sharded contract (/root/reference/train.py:229), asserted by
    tests/test_train.py.
    """
    n_devices = mesh.devices.size
    if train_cfg.batch_size % n_devices:
        raise ValueError(
            f'batch_size {train_cfg.batch_size} must be divisible by the '
            f'number of devices {n_devices}')
    per_device_batch = train_cfg.batch_size // n_devices
    loss_fn = loss_dict[train_cfg.loss_type]
    zero1 = train_cfg.shard_optimizer_state and n_devices > 1

    def device_step(state, all_rays, all_rgbs, base_rng):
        axis = jax.lax.axis_index(DATA_AXIS)
        rng = jax.random.fold_in(jax.random.fold_in(base_rng, state.step), axis)
        k_idx, k_sample, k_noise = jax.random.split(rng, 3)

        if explicit_batch:
            rays, rgbs = all_rays, all_rgbs
        else:
            n_total = all_rays.shape[0]
            idx = jax.random.randint(k_idx, (per_device_batch,), 0, n_total)
            rays = jnp.take(all_rays, idx, axis=0)
            rgbs = jnp.take(all_rgbs, idx, axis=0)
        rays_dict = prepare_ray_dict(rays)
        extra_params = compute_extra_params(nerf_cfg, train_cfg, state.step)

        elastic_on = train_cfg.elastic_loss_weight > 0
        background_on = (background_points is not None
                         and train_cfg.background_loss_weight > 0)

        def compute_loss(params):
            results = model.apply(
                {'params': forward_params(params)}, rays_dict, extra_params,
                rngs={'sampling': k_sample, 'sigma_noise': k_noise},
                occupancy_grid=state.occupancy,
                return_warp_jacobian=elastic_on)
            loss = loss_fn(results, rgbs)
            if elastic_on:
                from hypernerf_tpu.training.losses import \
                    weighted_elastic_loss
                loss = loss + train_cfg.elastic_loss_weight * \
                    weighted_elastic_loss(results,
                                          train_cfg.elastic_loss_scale)
            if background_on:
                from hypernerf_tpu.training.losses import background_loss
                # Derived from k_idx via fold_in so existing configs' RNG
                # streams are unchanged when the loss is off.
                k_bg = jax.random.fold_in(k_idx, 1)
                k_bgid = jax.random.fold_in(k_idx, 2)
                bidx = jax.random.randint(
                    k_bg, (train_cfg.background_points_per_step,), 0,
                    background_points.shape[0])
                pts = jnp.take(background_points, bidx, axis=0)
                ids = jax.random.randint(
                    k_bgid, (pts.shape[0], 1), 0, nerf_cfg.num_embeddings)
                warped = model.apply(
                    {'params': forward_params(params)}, pts, ids,
                    extra_params,
                    method=NerfModel.apply_warp)['warped_points']
                loss = loss + train_cfg.background_loss_weight * jnp.mean(
                    background_loss(warped, pts,
                                    train_cfg.background_loss_scale))
            typ = 'fine' if 'fine' in results else 'coarse'
            batch_mse = jnp.mean((results[typ]['rgb'] - rgbs) ** 2)
            return loss, batch_mse

        (loss, batch_mse), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        # Gradient sync over ICI — the NCCL allreduce equivalent.
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        batch_mse = jax.lax.pmean(batch_mse, DATA_AXIS)
        metrics = {'loss': loss, 'psnr': -10.0 * jnp.log10(batch_mse)}
        if zero1:
            # ZeRO-1: return the synced grads; the sharded optimizer update
            # runs outside the shard_map under sharding constraints.
            return grads, metrics

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state,
                               occupancy=state.occupancy)
        return new_state, metrics

    batch_spec = P(DATA_AXIS) if explicit_batch else P()
    sharded = shard_map(
        device_step, mesh=mesh,
        in_specs=(P(), batch_spec, batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False)

    if not zero1:
        return jax.jit(sharded, donate_argnums=(0,))

    from jax.sharding import NamedSharding

    def zero1_step(state, all_rays, all_rgbs, base_rng):
        """The fairscale ddp_sharded equivalent (train.py:229): grads are
        allreduced in the shard_map; the optimizer moments live sharded
        over the data axis (each device updates 1/N of them — XLA turns
        the elementwise Adam update into a sharded compute and gathers
        the parameter deltas back, a reduce-scatter/all-gather pattern).
        The math is elementwise per parameter, so the resulting step is
        identical to the replicated update (tests/test_train.py)."""
        # opt_state stays out of the shard_map (its P() in_spec would
        # all-gather the sharded moments just to ignore them).
        grads, metrics = sharded(state.replace(opt_state=None),
                                 all_rays, all_rgbs, base_rng)
        opt_state = shard_opt_state(mesh, state.opt_state)
        updates, new_opt = tx.update(grads, opt_state, state.params)
        new_opt = shard_opt_state(mesh, new_opt)
        params = optax.apply_updates(state.params, updates)
        params = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P())), params)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=new_opt,
                               occupancy=state.occupancy)
        return new_state, metrics

    return jax.jit(zero1_step, donate_argnums=(0,))


def make_occupancy_update(model: NerfModel, nerf_cfg: NerfConfig,
                          train_cfg: TrainConfig):
    """Jitted occupancy-grid refresh: state -> state with updated grid.

    Evaluates the model's own density at jittered grid-cell centers for
    TrainConfig.occupancy_probe_ids random metadata ids (folded from the
    step, identical on every device — the grid stays replicated), takes the
    max across ids so a moving object is visible to the grid for any frame
    probed this round, and EMA-maxes it into the grid
    (ops/occupancy.update_grid). Call every
    TrainConfig.occupancy_update_every steps.
    """
    from hypernerf_tpu.ops.occupancy import cell_points, update_grid

    cfg = nerf_cfg
    bbox = ((cfg.occupancy_bbox_min,) * 3, (cfg.occupancy_bbox_max,) * 3)
    n_ids = max(1, min(train_cfg.occupancy_probe_ids, cfg.num_embeddings))

    def update(state: TrainState, base_rng) -> TrainState:
        rng = jax.random.fold_in(base_rng, state.step)
        k_jit, k_id = jax.random.split(rng)
        pts = cell_points(cfg.occupancy_resolution, bbox, key=k_jit)
        mids = jax.random.randint(k_id, (n_ids,), 0, cfg.num_embeddings)
        extra_params = compute_extra_params(cfg, train_cfg, state.step)

        def probe(mid):
            metadata_id = jnp.full((pts.shape[0], 1), mid, jnp.int32)
            return model.apply(
                {'params': forward_params(state.params)}, pts, metadata_id,
                extra_params, method=NerfModel.query_sigma)

        sigma = jnp.max(jax.lax.map(probe, mids), axis=0)
        grid = update_grid(state.occupancy, sigma,
                           train_cfg.occupancy_decay)
        return state.replace(occupancy=grid)

    return jax.jit(update)
