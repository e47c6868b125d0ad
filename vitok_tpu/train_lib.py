"""Training core: optimizer, LR schedules, EMA, the jitted train step.

Replaces the reference training utilities (``vitok/utils.py:133-309``,
``scripts/train_vae.py:184-218, 295-380`` in Na-VAE/vitok-release) with the
optax/pjit-native equivalents:

* AdamW with decay/no-decay parameter groups (1-D params — norms, biases,
  LayerScale gammas — get no weight decay, same split as train_vae.py:184-196),
* cosine / linear / exponential-decay schedules with warmup
  (utils.py:222-309 semantics),
* fp32 EMA maintained inside the train step (utils.py:133-157),
* global-norm gradient clipping,
* one pure ``train_step`` that pjit shards over a (data, fsdp, model) mesh —
  grads reduce via XLA collectives instead of DDP/FSDP wrapper machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from vitok_tpu.losses import charbonnier_loss, ssim_loss
from vitok_tpu.models.ae import AEConfig, forward_apply
from vitok_tpu.pp.ops import sample_tiles, unpatchify

Array = jax.Array
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Schedules  (reference: BaseScheduler/Cosine/Linear/ExponentialDecay)
# ---------------------------------------------------------------------------


def create_schedule(
    name: str,
    base_lr: float,
    total_steps: int,
    warmup_frac: float = 0.05,
    end_lr_frac: float = 0.0,
    decay_rate: float = 0.1,
) -> optax.Schedule:
    """LR schedule factory mirroring the reference ``create_scheduler``.

    Names: "cosine" | "linear" | "exponential" | "constant". Warmup is linear
    from 0 over ``warmup_frac * total_steps`` (reference default 5%).
    """
    warmup = max(int(total_steps * warmup_frac), 0)
    decay_steps = max(total_steps - warmup, 1)
    if name == "cosine":
        main = optax.cosine_decay_schedule(
            base_lr, decay_steps, alpha=end_lr_frac
        )
    elif name == "linear":
        main = optax.linear_schedule(
            base_lr, base_lr * end_lr_frac, decay_steps
        )
    elif name == "exponential":
        main = optax.exponential_decay(
            base_lr, decay_steps, decay_rate, staircase=False
        )
    elif name == "constant":
        main = optax.constant_schedule(base_lr)
    else:
        raise ValueError(f"Unknown schedule: {name}")
    if warmup == 0:
        return main
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base_lr, warmup), main], [warmup]
    )


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------


def _decay_mask(params: Params) -> Params:
    """True for params that get weight decay: matrix weights only.

    Scan-stacked layout means norm scales / gammas / biases are 2-D (depth
    leading), so the usual ndim test misclassifies them — mask by leaf name
    instead (same decay/no-decay split as reference train_vae.py:184-196).
    """
    return jax.tree_util.tree_map_with_path(
        lambda path, p: getattr(path[-1], "key", "") in ("kernel", "ctx_embed"),
        params,
    )


def create_optimizer(
    schedule: optax.Schedule,
    weight_decay: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.99,
    grad_clip: float = 1.0,
    optimizer: str = "adamw",
    momentum: float = 0.95,
    moment_dtype: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW (decay/no-decay groups) or Muon, with global-norm clipping.

    Mirrors the reference's ``--optimizer {adamw,muon}`` choice
    (train_vae.py:62, 196-208); Muon is the TPU-native implementation in
    ``vitok_tpu.muon``.

    ``moment_dtype`` (e.g. ``jnp.bfloat16``) stores AdamW's first moment in
    reduced precision — noise-level impact on updates (momentum is a long
    EMA), but it cuts optimizer-state HBM traffic per step. The second
    moment stays fp32 (rsqrt of tiny values is precision-sensitive).
    """
    if optimizer == "muon":
        from vitok_tpu.muon import muon

        inner = muon(
            schedule, momentum=momentum, adam_b1=b1, adam_b2=b2,
            moment_dtype=moment_dtype,
        )
    elif optimizer == "adamw":
        inner = optax.adamw(
            learning_rate=schedule,
            b1=b1,
            b2=b2,
            weight_decay=weight_decay,
            mask=_decay_mask,
            mu_dtype=moment_dtype,
        )
    else:
        raise ValueError(f"Unknown optimizer: {optimizer}")
    return optax.chain(
        optax.clip_by_global_norm(grad_clip) if grad_clip else optax.identity(),
        inner,
    )


# ---------------------------------------------------------------------------
# Train state (plain pytree dataclass — no framework wrapper)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: Array
    params: Params
    opt_state: Any
    ema_params: Optional[Params]


def create_train_state(
    params: Params,
    tx: optax.GradientTransformation,
    ema: bool = True,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        # copy=True: fp32 params would otherwise alias the EMA buffers, and
        # donating the state then donates the same buffer twice.
        ema_params=jax.tree_util.tree_map(
            lambda p: jnp.array(p, jnp.float32, copy=True), params
        )
        if ema
        else None,
    )


def update_ema(ema: Params, params: Params, decay: float = 0.999) -> Params:
    """fp32 lerp EMA (reference utils.py:133-157)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(jnp.float32) * (1.0 - decay),
        ema,
        params,
    )


# ---------------------------------------------------------------------------
# Loss + step
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Static loss weights (reference defaults train_vae.py:68-75)."""

    charbonnier_weight: float = 1.0
    ssim_weight: float = 0.1
    perceptual_weight: float = 0.0  # 500.0 with a DINO feature_fn attached
    charbonnier_eps: float = 1e-3
    tile_size: int = 256
    n_tiles: int = 2
    patch: int = 16
    # Dense grid (rows, cols) for the SSIM branch; None disables it.
    ssim_grid: Optional[Tuple[int, int]] = None


def compute_loss(
    params: Params,
    batch: Dict[str, Array],
    cfg: AEConfig,
    loss_cfg: LossConfig,
    rng: Array,
    feature_fn: Optional[Callable[[Array], Array]] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[Array, Dict[str, Array]]:
    """Forward + loss stack. Returns (loss, metrics dict)."""
    drop_rng, tile_rng = jax.random.split(rng)
    out = forward_apply(
        params, batch, cfg,
        deterministic=False, rng=drop_rng, compute_dtype=compute_dtype,
    )
    mask = batch.get("patch_mask")
    l_char = charbonnier_loss(
        out["patches"], batch["patches"], mask, eps=loss_cfg.charbonnier_eps
    )
    loss = loss_cfg.charbonnier_weight * l_char
    metrics = {"loss/charbonnier": l_char}

    want_tiles = loss_cfg.ssim_weight or (
        loss_cfg.perceptual_weight and feature_fn is not None
    )
    if want_tiles and loss_cfg.ssim_grid is not None:
        gr, gc = loss_cfg.ssim_grid
        recon = unpatchify_dense_static(out, gr, gc, loss_cfg.patch)
        target = unpatchify_dense_static(batch, gr, gc, loss_cfg.patch)
        # Perceptual-style tile sampling with shared indices (reference
        # train_vae.py:328-368): deterministic re-crop of both branches.
        th = min(loss_cfg.tile_size, gr * loss_cfg.patch)
        tw = min(loss_cfg.tile_size, gc * loss_cfg.patch)
        tiles_r, idx = sample_tiles(
            recon, batch["orig_height"], batch["orig_width"],
            n_tiles=loss_cfg.n_tiles, tile_size=(th, tw), rng=tile_rng,
        )
        tiles_t, _ = sample_tiles(
            target, batch["orig_height"], batch["orig_width"],
            n_tiles=loss_cfg.n_tiles, tile_size=(th, tw), indices=idx,
        )
        bt = tiles_r.shape[0] * tiles_r.shape[1]
        flat_r = tiles_r.reshape(bt, *tiles_r.shape[2:])
        flat_t = tiles_t.reshape(bt, *tiles_t.shape[2:])
        if loss_cfg.ssim_weight:
            l_ssim = ssim_loss(flat_r, flat_t)
            loss = loss + loss_cfg.ssim_weight * l_ssim
            metrics["loss/ssim"] = l_ssim

        if loss_cfg.perceptual_weight and feature_fn is not None:
            from vitok_tpu.losses import perceptual_loss

            l_perc = perceptual_loss(feature_fn, flat_r, flat_t)
            loss = loss + loss_cfg.perceptual_weight * l_perc
            metrics["loss/perceptual"] = l_perc

    metrics["loss/total"] = loss
    return loss, metrics


def unpatchify_dense_static(
    d: Dict[str, Array], grid_rows: int, grid_cols: int, patch: int
) -> Array:
    """Static-shape dense unpatchify for jit'd loss paths (reshape only)."""
    patches = d["patches"]
    mask = d.get("patch_mask")
    if mask is not None:
        patches = jnp.where(mask[..., None], patches, 0.0)
    b = patches.shape[0]
    n = grid_rows * grid_cols
    c = patches.shape[-1] // (patch * patch)
    x = patches[:, :n].reshape(b, grid_rows, grid_cols, c, patch, patch)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(
        b, c, grid_rows * patch, grid_cols * patch
    )


def make_train_step(
    cfg: AEConfig,
    tx: optax.GradientTransformation,
    loss_cfg: LossConfig = LossConfig(),
    ema_decay: float = 0.999,
    feature_fn: Optional[Callable[[Array], Array]] = None,
    compute_dtype=jnp.bfloat16,
    donate: bool = True,
    grad_accum: int = 1,
):
    """Build the jitted train step ``(state, batch, rng) -> (state, metrics)``.

    Pure function of pytrees — pjit-shardable by passing sharded state/batch;
    XLA derives the collective schedule from the input shardings.

    ``grad_accum > 1`` splits the batch into that many microbatches along
    axis 0 (must divide the batch size) and averages their gradients in
    fp32 under one ``lax.scan`` before a single optimizer update — peak
    activation memory drops to one microbatch's worth at the cost of a
    params-sized fp32 accumulator. Each microbatch loss is its own masked
    mean, so the averaged gradient equals the full-batch gradient exactly
    when microbatches hold equal valid-token counts (always true for
    fixed-grid batches) and matches torch-style ``loss/accum`` semantics
    otherwise. The reference has no accumulation path (its effective batch
    scales only with GPU count, train_vae.py:62); this exists so one chip
    can train reference-scale global batches.
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    grad_fn = jax.value_and_grad(compute_loss, has_aux=True)

    def step(state: TrainState, batch: Dict[str, Array], rng: Array):
        step_rng = jax.random.fold_in(rng, state.step)
        if grad_accum == 1:
            (loss, metrics), grads = grad_fn(
                state.params, batch, cfg, loss_cfg, step_rng,
                feature_fn=feature_fn, compute_dtype=compute_dtype,
            )
        else:
            b = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if b % grad_accum:
                raise ValueError(
                    f"batch size {b} not divisible by grad_accum {grad_accum}"
                )
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape(
                    (grad_accum, x.shape[0] // grad_accum) + x.shape[1:]
                ),
                batch,
            )

            def micro_grads(mb, i):
                (_, m), g = grad_fn(
                    state.params, mb, cfg, loss_cfg,
                    jax.random.fold_in(step_rng, i),
                    feature_fn=feature_fn, compute_dtype=compute_dtype,
                )
                return m, jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32), g
                )

            # Seed the scan carry with eval_shape zeros so the heavy
            # forward+backward graph is emitted ONCE (inside the scan body)
            # instead of twice — computing microbatch 0 outside the scan
            # doubled the jitted program's biggest subgraph, a real cost on
            # a tunnel whose remote compile helper is fragile (CLAUDE.md).
            m_shape, g_shape = jax.eval_shape(
                micro_grads,
                jax.tree_util.tree_map(lambda x: x[0], micro),
                jnp.int32(0),
            )
            zeros = lambda tree: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), tree
            )

            def body(carry, xs):
                mb, i = xs
                m, g = micro_grads(mb, i)
                return (
                    jax.tree_util.tree_map(jnp.add, carry[0], g),
                    jax.tree_util.tree_map(jnp.add, carry[1], m),
                ), None

            (gacc, macc), _ = jax.lax.scan(
                body,
                (zeros(g_shape), zeros(m_shape)),
                (micro, jnp.arange(grad_accum)),
            )
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gacc)
            metrics = jax.tree_util.tree_map(lambda m: m / grad_accum, macc)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (
            update_ema(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None
            else None
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


__all__ = [
    "create_schedule",
    "create_optimizer",
    "TrainState",
    "create_train_state",
    "update_ema",
    "LossConfig",
    "compute_loss",
    "make_train_step",
]
