"""Sequence parallelism: token-sharded forward with halo-exchange attention.

The genuine scaling improvement SURVEY.md §5.7/§7 identifies beyond the
reference: at 8192p one image is 262k tokens — the reference is forever
bound to one GPU's memory/FLOPs for it. Here the token axis shards across
chips (`seq` mesh axis). Everything in the ViT block is per-token
(matmuls/norms/RoPE shard trivially); only sliding-window attention needs
neighbor context, which a **halo exchange** provides: each shard
`ppermute`s its first/last ``sw`` keys/values to its neighbors over ICI,
then computes windowed attention locally. Communication is O(sw·width) per
shard per layer — independent of total sequence length.

``sequence_parallel_forward`` runs the full AE forward under ``shard_map``
with token-sharded activations; numerics are verified identical to the
single-device forward on the virtual CPU mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

SEQ_AXIS = "seq"


def halo_attention(
    q: Array,
    k: Array,
    v: Array,
    patch_mask: Optional[Array],
    sliding_window: int,
    axis: str = SEQ_AXIS,
) -> Array:
    """Windowed attention over a token-sharded sequence (inside shard_map).

    q, k, v: ``[B, n_local, H, D]`` (local shard). Each shard receives the
    ``sw`` boundary keys/values of both neighbors via ``ppermute``
    (edge shards get zero-fill, masked out via the exchanged patch mask),
    then attends its local queries against ``[sw | local | sw]`` keys with
    the exact global window mask.
    """
    n_shards = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    b, nl, h, d = q.shape
    sw = sliding_window
    if sw > nl:
        raise ValueError(
            f"halo attention needs sliding_window ({sw}) <= tokens per shard ({nl})"
        )

    if patch_mask is None:
        patch_mask = jnp.ones((b, nl), bool)
    pm = patch_mask.astype(bool)

    # Halo exchange over ICI: shard i sends its tail to i+1 and head to i-1.
    to_right = [(i, i + 1) for i in range(n_shards - 1)]
    to_left = [(i + 1, i) for i in range(n_shards - 1)]

    def from_left(x):  # left neighbor's tail (zero-filled at shard 0)
        return jax.lax.ppermute(x, axis, to_right)

    def from_right(x):  # right neighbor's head (zero-filled at last shard)
        return jax.lax.ppermute(x, axis, to_left)

    k_ext = jnp.concatenate(
        [from_left(k[:, -sw:]), k, from_right(k[:, :sw])], axis=1
    )
    v_ext = jnp.concatenate(
        [from_left(v[:, -sw:]), v, from_right(v[:, :sw])], axis=1
    )
    pm_ext = jnp.concatenate(
        [from_left(pm[:, -sw:]), pm, from_right(pm[:, :sw])], axis=1
    )

    # Global positions: queries offset by idx*nl; extended keys by idx*nl-sw.
    q_pos = idx * nl + jnp.arange(nl)
    k_pos = idx * nl - sw + jnp.arange(nl + 2 * sw)
    window = jnp.abs(q_pos[:, None] - k_pos[None, :]) <= sw  # [nl, next]
    mask = window[None, None] & pm_ext[:, None, None, :]  # [B,1,nl,next]

    # Same softmax-attention core as every other backend (single source of
    # numerics — keeps the sharded==single-device parity invariant).
    from vitok_tpu.ops.attention import _xla_attention

    out = _xla_attention(q, k_ext, v_ext, mask)
    # Dead query rows (padding) -> 0, matching the flash kernel semantics.
    return out * pm[:, :, None, None].astype(out.dtype)


def _seq_specs(batch: Dict[str, Array]):
    """PartitionSpecs for a NaFlex dict with the token axis sharded."""
    specs = {}
    for key, val in batch.items():
        if val is None:
            specs[key] = P()
        elif val.ndim >= 2:
            specs[key] = P(*((None, SEQ_AXIS) + (None,) * (val.ndim - 2)))
        else:
            specs[key] = P()
    return specs


def sequence_parallel_forward(
    params,
    patch_dict: Dict[str, Array],
    cfg,
    mesh: Mesh,
    compute_dtype=jnp.bfloat16,
):
    """Full AE forward with the token axis sharded over the ``seq`` mesh axis.

    Requires ``cfg.sw`` (the halo size equals the window) and token count
    divisible by the ``seq`` axis size. Params are replicated; activations,
    RoPE tables, and the attention halo all live shard-local — the only
    inter-chip traffic is the O(sw) boundary exchange per attention call.
    """
    from vitok_tpu.models.ae import forward_apply

    if cfg.sw is None:
        raise ValueError("sequence_parallel_forward requires cfg.sw (SWA)")
    cfg_local = dataclasses.replace(cfg, attn_impl=f"halo:{SEQ_AXIS}")

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(), params),
        _seq_specs(patch_dict),
    )
    # Output dict mirrors input metadata + the model half's output tensor
    # ("patches" for decoder configs, "z" latents for encoder-only).
    out_template = {
        k: patch_dict[k]
        for k in ("patch_mask", "row_idx", "col_idx", "orig_height", "orig_width")
        if k in patch_dict
    }
    out_template["patches" if cfg.decoder else "z"] = patch_dict["patches"]
    out_specs = _seq_specs(out_template)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def local_forward(p, d):
        return forward_apply(p, d, cfg_local, compute_dtype=compute_dtype)

    return local_forward(params, patch_dict)


def sequence_parallel_value_and_grad(
    params,
    patch_dict: Dict[str, Array],
    cfg,
    mesh: Mesh,
    compute_dtype=jnp.bfloat16,
    charbonnier_eps: float = 1e-3,
    rng: Optional[Array] = None,
):
    """Reconstruction loss + parameter grads with the token axis sharded.

    This is the training side of sequence parallelism: high-res finetuning
    (SURVEY §5.7 — 262k tokens at 8192p) can token-shard its BACKWARD, which
    the reference structurally cannot. The halo exchange differentiates
    through ``ppermute`` (its VJP is the inverse permutation), the masked
    per-image Charbonnier mean uses ``psum`` for the global token sums, and
    grads are ``psum``-reduced so every shard returns the full replicated
    gradient — numerics equal to the single-device
    ``value_and_grad(charbonnier_loss ∘ forward_apply)``.

    Returns:
        ``(loss, grads)`` — scalar loss and a grads pytree shaped like
        ``params`` (replicated).
    """
    if cfg.sw is None:
        raise ValueError("sequence-parallel training requires cfg.sw (SWA)")
    cfg_local = dataclasses.replace(cfg, attn_impl=f"halo:{SEQ_AXIS}")

    in_specs = (
        jax.tree_util.tree_map(lambda _: P(), params),
        _seq_specs(patch_dict),
    )
    out_specs = (P(), jax.tree_util.tree_map(lambda _: P(), params))

    from vitok_tpu.models.ae import forward_apply

    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def local_value_and_grad(p, d):
        mask = d.get("patch_mask")
        m0 = (
            mask.astype(jnp.float32)
            if mask is not None
            else jnp.ones(d["patches"].shape[:2], jnp.float32)
        )
        # Global per-image token count, outside the differentiated function
        # (masks carry no gradient; keeping psum out of the grad path also
        # sidesteps shard_map's psum-transpose double-count on replicated
        # cotangents).
        den = jax.lax.stop_gradient(
            jnp.maximum(jax.lax.psum(jnp.sum(m0, axis=-1), SEQ_AXIS), 1.0)
        )

        def loss_fn(p_):
            out = forward_apply(
                p_, d, cfg_local,
                deterministic=rng is None, rng=rng,
                compute_dtype=compute_dtype,
            )
            diff = out["patches"].astype(jnp.float32) - d["patches"].astype(
                jnp.float32
            )
            per_token = jnp.mean(
                jnp.sqrt(diff * diff + charbonnier_eps * charbonnier_eps),
                axis=-1,
            )  # [B, n_local]
            # LOCAL partial of charbonnier_loss's mask-weighted per-image
            # mean: summing the partials over shards gives the global loss.
            return jnp.mean(jnp.sum(per_token * m0, axis=-1) / den)

        loss_local, g = jax.value_and_grad(loss_fn)(p)
        # Each shard's grad/loss covers only its token shard; params are
        # replicated, so one psum assembles the full replicated results.
        loss = jax.lax.psum(loss_local, SEQ_AXIS)
        g = jax.tree_util.tree_map(lambda a: jax.lax.psum(a, SEQ_AXIS), g)
        return loss, g

    return local_value_and_grad(params, patch_dict)


def place_batch_token_sharded(batch: Dict[str, Array], mesh: Mesh):
    """Device-put a NaFlex batch with the token axis sharded over ``seq``.

    Matches the specs ``sequence_parallel_*`` expect: ``[B, N, ...]``
    tensors split on axis 1, 1-D/None metadata replicated.
    """
    from jax.sharding import NamedSharding

    specs = _seq_specs(batch)
    return {
        k: (
            v
            if v is None
            else jax.device_put(v, NamedSharding(mesh, specs[k]))
        )
        for k, v in batch.items()
    }


def make_sp_train_step(
    cfg,
    tx,
    mesh: Mesh,
    ema_decay: float = 0.999,
    compute_dtype=jnp.bfloat16,
    charbonnier_eps: float = 1e-3,
    stochastic: bool = False,
    donate: bool = True,
):
    """Build a jitted token-sharded train step ``(state, batch, rng)``.

    The high-res finetune step (SURVEY §5.7 regime): the Charbonnier
    reconstruction backward runs token-sharded over the ``seq`` mesh axis
    via ``sequence_parallel_value_and_grad`` (grads come back replicated),
    then the standard optax update + fp32 EMA — the same state layout as
    ``train_lib.make_train_step``, so Orbax checkpoints interchange.

    ``stochastic=True`` threads the per-step rng through the forward for
    stochastic depth; every token shard derives the identical per-sample
    gates (the rng is replicated), which is exactly what correctness
    requires — a sample is either dropped on all of its token shards or
    none.
    """
    import optax

    from vitok_tpu.train_lib import TrainState, update_ema

    def step(state: TrainState, batch: Dict[str, Array], rng):
        step_rng = (
            jax.random.fold_in(rng, state.step) if stochastic else None
        )
        loss, grads = sequence_parallel_value_and_grad(
            state.params, batch, cfg, mesh,
            compute_dtype=compute_dtype,
            charbonnier_eps=charbonnier_eps,
            rng=step_rng,
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = (
            update_ema(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None
            else None
        )
        metrics = {
            "loss/total": loss,
            "grad_norm": optax.global_norm(grads),
        }
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


__all__ = [
    "halo_attention",
    "sequence_parallel_forward",
    "sequence_parallel_value_and_grad",
    "place_batch_token_sharded",
    "make_sp_train_step",
    "SEQ_AXIS",
]
