"""Pipeline parallelism: the decoder block stack staged across chips.

The 5B decoder is 40 identical blocks — a natural pipeline. Stacked block
params shard their **depth axis** over a ``pipe`` mesh axis (each stage
holds ``depth / n_stages`` layers); microbatches rotate through the stages
with ``ppermute`` in the classic GPipe schedule. All of it runs inside one
``shard_map`` — XLA overlaps each stage's compute with its neighbor
transfer over ICI.

Memory design (per-chip activations scale ~1/S with S stages):

* **inputs** are the *latents* (``z``, tiny vs. the post-embed width),
  sharded round-robin over stages — stage ``s`` stores microbatches
  ``r*S + s``. A backward-rotating ring buffer delivers exactly the right
  microbatch to stage 0 each tick, where ``decoder_embed`` is applied
  inside the pipeline, so the wide ``[B, N, width]`` tensor never
  materializes outside a single microbatch per stage,
* **outputs** are projected to patch pixels by ``to_pixels`` *inside the
  last stage* and injected into a forward-rotating drain ring; each stage
  snatches its own microbatches (owner = ``q mod S``) as they pass by, so
  finished outputs are stored sharded, never broadcast,
* only O(1) microbatch-sized rotating buffers are replicated.

The schedule runs ``m + 2S - 1`` ticks (vs. the GPipe minimum ``m + S - 1``;
the extra ``S`` ticks drain the output ring). The reference has no pipeline
parallelism at all (SURVEY.md §2.9). Verified numerically identical to the
single-device decode on the virtual CPU mesh.
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
    stream through the stages. Requires ``decoder_depth % n_stages == 0``,
    ``batch % num_microbatches == 0`` and
    ``num_microbatches % n_stages == 0`` (inputs/outputs are stored sharded
    round-robin over stages).
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
    if m % n_stages:
        raise ValueError(
            f"microbatches {m} not divisible by pipe={n_stages} "
            "(inputs/outputs shard round-robin over stages)"
        )
    S = n_stages
    rounds = m // S

    z = encode_dict["z"]
    rope = _rope_tables(encode_dict, cfg.decoder_head_dim, cfg.rope_theta)
    patch_mask = encode_dict.get("patch_mask")
    if patch_mask is None:
        patch_mask = jnp.ones(z.shape[:2], bool)

    mb = b // m
    split = lambda a: a.reshape((m, mb) + a.shape[1:])
    # Stage s owns microbatches r*S + s: regroup [m, ...] -> [rounds, S, ...]
    # and shard the stage axis.
    z_sh = split(z).reshape((rounds, S, mb) + z.shape[1:])
    cos_micro, sin_micro = split(rope[0]), split(rope[1])
    mask_micro = split(patch_mask)

    n_tok = z.shape[1]
    width = cfg.decoder_width
    ppt = params["to_pixels"]["kernel"].shape[-1]

    blocks = params["decoder_blocks"]
    block_specs = jax.tree_util.tree_map(
        lambda leaf: P(*((PIPE_AXIS,) + (None,) * (leaf.ndim - 1))), blocks
    )
    rep = jax.tree_util.tree_map(lambda _: P(), params["decoder_embed"])
    rep_tp = jax.tree_util.tree_map(lambda _: P(), params["to_pixels"])

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            block_specs, rep, rep_tp,
            P(None, PIPE_AXIS), P(), P(), P(),
        ),
        out_specs=P(PIPE_AXIS),
        check_vma=False,
    )
    def run_pipeline(local_blocks, embed_p, topix_p, z_local, coss, sins, masks):
        stage = jax.lax.axis_index(PIPE_AXIS)
        is_first = stage == 0
        is_last = stage == S - 1
        line_perm = [(i, i + 1) for i in range(S - 1)]
        ring_fwd = [(i, (i + 1) % S) for i in range(S)]
        ring_bwd = [(i, (i - 1) % S) for i in range(S)]
        z_local = z_local[:, 0]  # [rounds, mb, N, zdim]

        def tick(t, carry):
            state, rotbuf, drain, outputs = carry
            # Refill the input ring at round start: stage s loads its own
            # microbatch t + s; after j backward rotations stage 0 holds
            # microbatch t + j — exactly the one it must ingest at tick t+j.
            rotbuf = jax.lax.cond(
                t % S == 0,
                lambda rb: z_local[jnp.clip(t // S, 0, rounds - 1)],
                lambda rb: rb,
                rotbuf,
            )
            inp = jnp.where(
                is_first,
                _linear(rotbuf.astype(compute_dtype), embed_p),
                state,
            )
            # Stage s processes microbatch t - s this tick.
            rope_idx = jnp.clip(t - stage, 0, m - 1)
            out = _stage_apply(
                local_blocks,
                inp,
                (coss[rope_idx], sins[rope_idx]),
                masks[rope_idx],
                cfg,
            )
            patches = _linear(out, topix_p)
            # Collect from the drain ring BEFORE injecting: microbatch q
            # sits at stage s at tick q + S + s; its owner is q mod S.
            q = t - S - stage
            outputs = jax.lax.cond(
                jnp.logical_and(
                    jnp.logical_and(q >= 0, q < m), q % S == stage
                ),
                lambda o: o.at[jnp.clip(q // S, 0, rounds - 1)].set(
                    drain.astype(o.dtype)
                ),
                lambda o: o,
                outputs,
            )
            # Last stage injects the microbatch it just finished (t - S + 1).
            drain = jnp.where(is_last, patches, drain)
            # Rotate: activations down the line, drain/input around rings.
            state = jax.lax.ppermute(out, PIPE_AXIS, line_perm)
            drain = jax.lax.ppermute(drain, PIPE_AXIS, ring_fwd)
            rotbuf = jax.lax.ppermute(rotbuf, PIPE_AXIS, ring_bwd)
            return state, rotbuf, drain, outputs

        state0 = jnp.zeros((mb, n_tok, width), compute_dtype)
        rot0 = jnp.zeros_like(z_local[0])
        drain0 = jnp.zeros((mb, n_tok, ppt), compute_dtype)
        out0 = jnp.zeros((rounds, mb, n_tok, ppt), compute_dtype)
        _, _, _, outputs = jax.lax.fori_loop(
            0, m + 2 * S - 1, tick, (state0, rot0, drain0, out0)
        )
        return outputs

    y = run_pipeline(
        blocks, params["decoder_embed"], params["to_pixels"],
        z_sh, cos_micro, sin_micro, mask_micro,
    )
    # Global layout is stage-major ([s*rounds + r] = microbatch r*S + s);
    # reorder back to microbatch order, then flatten to the batch.
    y = y.reshape((S, rounds, mb, n_tok, ppt))
    y = y.transpose(1, 0, 2, 3, 4).reshape((b, n_tok, ppt))

    out = _meta(encode_dict)
    out["patches"] = y
    return out


__all__ = ["pipeline_parallel_decode", "PIPE_AXIS"]
