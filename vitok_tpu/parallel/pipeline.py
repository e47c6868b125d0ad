"""Pipeline parallelism: the decoder block stack staged across chips.

The 5B decoder is 40 identical blocks — a natural pipeline. Stacked block
params shard their **depth axis** over a ``pipe`` mesh axis (each stage
holds ``depth / n_stages`` layers); microbatches rotate through the stages
with ``ppermute`` in the classic GPipe schedule (S + M - 1 ticks for M
microbatches over S stages). All of it runs inside one ``shard_map`` —
XLA overlaps each stage's compute with its neighbor transfer over ICI.

The reference has no pipeline parallelism at all (SURVEY.md §2.9). Here it
is verified numerically identical to the single-device decode on the
virtual CPU mesh.

Current memory profile: microbatch activations are replicated to every
stage and the outputs buffer is psum-broadcast — correct and simple, but
per-chip activation memory does not shrink with pipeline depth yet
(stage-0-only feeding / sharded outputs are the follow-up optimization).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

PIPE_AXIS = "pipe"


def _stage_apply(local_blocks, x, rope, patch_mask, cfg):
    """Run this stage's slice of the block stack (scan over local depth)."""
    from vitok_tpu.models.ae import _block_body

    def body(carry, blk):
        out = _block_body(
            carry, blk, rope, patch_mask,
            num_heads=cfg.decoder_heads,
            sliding_window=cfg.sw,
            attn_impl=cfg.attn_impl,
            drop_path_prob=jnp.float32(0.0),
            drop_path_rng=None,
        )
        return out, None

    x, _ = jax.lax.scan(body, x, local_blocks)
    return x


def pipeline_parallel_decode(
    params,
    encode_dict: Dict[str, Array],
    cfg,
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
) -> Dict[str, Array]:
    """Decode with the block stack pipelined over the ``pipe`` mesh axis.

    Batch is split into ``num_microbatches`` (default: pipeline depth) that
    stream through the stages. Embed/unembed are tiny and run replicated.
    Requires ``decoder_depth % n_stages == 0`` and
    ``batch % num_microbatches == 0``.
    """
    from vitok_tpu.models.ae import _linear, _meta, _rope_tables

    n_stages = mesh.shape[PIPE_AXIS]
    if cfg.decoder_depth % n_stages:
        raise ValueError(
            f"decoder_depth {cfg.decoder_depth} not divisible by "
            f"pipe={n_stages}"
        )
    b = encode_dict["z"].shape[0]
    m = num_microbatches or n_stages
    if b % m:
        raise ValueError(f"batch {b} not divisible by microbatches {m}")

    # Replicated prologue (cheap): embed + RoPE tables.
    x = _linear(
        encode_dict["z"].astype(compute_dtype), params["decoder_embed"]
    )
    rope = _rope_tables(encode_dict, cfg.decoder_head_dim, cfg.rope_theta)
    patch_mask = encode_dict.get("patch_mask")
    if patch_mask is None:
        patch_mask = jnp.ones(x.shape[:2], bool)

    mb = b // m
    split = lambda a: a.reshape((m, mb) + a.shape[1:])
    x_micro = split(x)
    cos_micro, sin_micro = split(rope[0]), split(rope[1])
    mask_micro = split(patch_mask)

    blocks = params["decoder_blocks"]
    block_specs = jax.tree_util.tree_map(
        lambda leaf: P(*((PIPE_AXIS,) + (None,) * (leaf.ndim - 1))), blocks
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(block_specs, P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run_pipeline(local_blocks, xs, coss, sins, masks):
        stage = jax.lax.axis_index(PIPE_AXIS)
        is_first = stage == 0
        is_last = stage == n_stages - 1
        fwd_perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(t, carry):
            state, outputs = carry
            # Stage 0 ingests microbatch t (clamped; stale ticks discarded
            # because their outputs never land in the collection window).
            mb_idx = jnp.clip(t, 0, m - 1)
            inp = jnp.where(
                is_first, xs[mb_idx].astype(compute_dtype), state
            )
            rope_idx = jnp.clip(t - stage, 0, m - 1)
            out = _stage_apply(
                local_blocks,
                inp,
                (coss[rope_idx], sins[rope_idx]),
                masks[rope_idx],
                cfg,
            )
            # Last stage writes finished microbatch t - (S-1).
            done_idx = t - (n_stages - 1)
            outputs = jax.lax.cond(
                jnp.logical_and(is_last, done_idx >= 0),
                lambda o: o.at[jnp.clip(done_idx, 0, m - 1)].set(
                    out.astype(o.dtype)
                ),
                lambda o: o,
                outputs,
            )
            # Rotate activations to the next stage.
            state = jax.lax.ppermute(out, PIPE_AXIS, fwd_perm)
            return state, outputs

        state = jnp.zeros((mb,) + xs.shape[2:], compute_dtype)
        outputs = jnp.zeros_like(xs)
        state, outputs = jax.lax.fori_loop(
            0, m + n_stages - 1, tick, (state, outputs)
        )
        # Only the last stage holds real outputs; broadcast via psum.
        outputs = jnp.where(is_last, outputs, jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, PIPE_AXIS)

    y = run_pipeline(blocks, x_micro, cos_micro, sin_micro, mask_micro)
    y = y.reshape((b,) + y.shape[2:])

    out = _meta(encode_dict)
    out["patches"] = _linear(y.astype(compute_dtype), params["to_pixels"])
    return out


__all__ = ["pipeline_parallel_decode", "PIPE_AXIS"]
