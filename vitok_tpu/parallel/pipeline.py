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
the extra ``S`` ticks drain the output ring).

**Training** (``pipeline_parallel_value_and_grad``) reverse-differentiates
the same schedule: the tick loop's trip count is static so ``fori_loop``
lowers to ``scan`` and transposes, ``ppermute``'s VJP is the inverse
permutation (cotangents flow back *up* the stage line in the transposed
schedule, exactly 1F1B-reversed GPipe), and each stage's block-slice
gradient stays resident on its own chip — block grads come back **sharded
over the pipe axis**, like the params. With ``remat=True`` (default) each
stage's block stack recomputes in the backward, so the per-tick residuals
are only the stage-boundary activations: the classic GPipe activation
footprint, ~1/S per chip. The reference has no pipeline parallelism at all
(SURVEY.md §2.9). Verified grads == single-device ``value_and_grad`` on the
virtual CPU mesh (tests/test_pipeline.py).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

PIPE_AXIS = "pipe"


def _stage_apply(local_blocks, x, rope, patch_mask, cfg, deterministic=True):
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
            deterministic=deterministic,
        )
        return out, None

    x, _ = jax.lax.scan(body, x, local_blocks)
    return x


def _validate_layout(
    cfg, batch: int, n_stages: int, m: int, mesh: Optional[Mesh] = None
) -> Tuple[int, int]:
    if cfg.decoder_depth % n_stages:
        raise ValueError(
            f"decoder_depth {cfg.decoder_depth} not divisible by "
            f"pipe={n_stages}"
        )
    if batch % m:
        raise ValueError(f"batch {batch} not divisible by microbatches {m}")
    if m % n_stages:
        raise ValueError(
            f"microbatches {m} not divisible by pipe={n_stages} "
            "(inputs/outputs shard round-robin over stages)"
        )
    mb = batch // m
    if mesh is not None:
        d = 1
        for a in _mesh_data_axes(mesh):
            d *= mesh.shape[a]
        if mb % d:
            raise ValueError(
                f"microbatch size {mb} (batch {batch} / microbatches {m}) "
                f"not divisible by the data-parallel extent {d} "
                "(each microbatch's rows shard over the data axes)"
            )
    return m // n_stages, mb  # rounds, microbatch size


def _pipeline_outputs(
    local_blocks, embed_p, topix_p, z_local, coss, sins, masks,
    *, cfg, S, m, rounds, n_tok, width, ppt, compute_dtype,
    deterministic=True, remat=False,
):
    """Per-shard GPipe loop: ``z_local [rounds, mb, N, zdim]`` (this stage's
    owned microbatches) → ``outputs [rounds, mb, N, ppt]`` (same ownership).

    Runs inside ``shard_map`` over the ``pipe`` axis. Differentiable: the
    trip count is static, so reverse AD transposes the ``fori_loop`` as a
    scan and each ``ppermute`` as its inverse rotation. ``remat=True`` wraps
    the stage's block stack in ``jax.checkpoint`` so the backward stores
    only stage-boundary activations per tick (GPipe memory), recomputing the
    blocks on the way back.
    """
    stage = jax.lax.axis_index(PIPE_AXIS)
    is_first = stage == 0
    is_last = stage == S - 1
    line_perm = [(i, i + 1) for i in range(S - 1)]
    ring_fwd = [(i, (i + 1) % S) for i in range(S)]
    ring_bwd = [(i, (i - 1) % S) for i in range(S)]
    mb = z_local.shape[1]

    stage_fn = _stage_apply
    if remat:
        stage_fn = jax.checkpoint(
            _stage_apply, static_argnums=(4, 5), prevent_cse=False
        )

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
        from vitok_tpu.models.ae import _linear

        inp = jnp.where(
            is_first,
            _linear(rotbuf.astype(compute_dtype), embed_p),
            state,
        )
        # Stage s processes microbatch t - s this tick.
        rope_idx = jnp.clip(t - stage, 0, m - 1)
        out = stage_fn(
            local_blocks,
            inp,
            (coss[rope_idx], sins[rope_idx]),
            masks[rope_idx],
            cfg,
            deterministic,
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


def _microbatch_layouts(encode_dict, cfg, m: int, S: int):
    """Split batch-level tensors into the pipeline's sharded/replicated
    layouts: z round-robin over stages, rope/mask replicated per microbatch."""
    from vitok_tpu.models.ae import _rope_tables

    z = encode_dict["z"]
    b = z.shape[0]
    rounds, mb = b // m, None  # caller validated
    mb = b // m
    rope = _rope_tables(encode_dict, cfg.decoder_head_dim, cfg.rope_theta)
    patch_mask = encode_dict.get("patch_mask")
    if patch_mask is None:
        patch_mask = jnp.ones(z.shape[:2], bool)
    rounds = m // S
    split = lambda a: a.reshape((m, mb) + a.shape[1:])
    # Stage s owns microbatches r*S + s: regroup [m, ...] -> [rounds, S, ...]
    # and shard the stage axis.
    z_sh = split(z).reshape((rounds, S, mb) + z.shape[1:])
    cos_micro, sin_micro = split(rope[0]), split(rope[1])
    mask_micro = split(patch_mask)
    return z_sh, cos_micro, sin_micro, mask_micro, split, rounds, mb


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
    from vitok_tpu.models.ae import _meta

    n_stages = mesh.shape[PIPE_AXIS]
    b = encode_dict["z"].shape[0]
    m = num_microbatches or n_stages
    S = n_stages
    rounds, mb = _validate_layout(cfg, b, S, m)

    z_sh, cos_micro, sin_micro, mask_micro, _, _, _ = _microbatch_layouts(
        encode_dict, cfg, m, S
    )
    n_tok = encode_dict["z"].shape[1]
    width = cfg.decoder_width
    ppt = params["to_pixels"]["kernel"].shape[-1]

    blocks = params["decoder_blocks"]
    block_specs = jax.tree_util.tree_map(
        lambda leaf: P(*((PIPE_AXIS,) + (None,) * (leaf.ndim - 1))), blocks
    )
    rep = jax.tree_util.tree_map(lambda _: P(), params["decoder_embed"])
    rep_tp = jax.tree_util.tree_map(lambda _: P(), params["to_pixels"])

    run = functools.partial(
        _pipeline_outputs,
        cfg=cfg, S=S, m=m, rounds=rounds, n_tok=n_tok, width=width, ppt=ppt,
        compute_dtype=compute_dtype,
    )

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
        return run(
            local_blocks, embed_p, topix_p, z_local[:, 0], coss, sins, masks
        )

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


def _mesh_data_axes(mesh: Mesh) -> Tuple[str, ...]:
    """Mesh axes (beyond ``pipe``) that batch-replicate the pipeline.

    A ``(data, pipe)`` mesh runs one independent GPipe replica per ``data``
    slice: each microbatch's rows are sharded over ``data``, block grads are
    psum'd across replicas, and the loss partials reduce over both axes —
    the composition the reference gets from DDP-wrapping its trainer
    (``scripts/train_vae.py:164-174``).
    """
    return tuple(
        a for a in mesh.axis_names if a != PIPE_AXIS and mesh.shape[a] > 1
    )


@functools.lru_cache(maxsize=64)
def _cached_vjg(
    cfg, mesh, S, m, rounds, n_tok, width, ppt, dtype_name,
    charbonnier_eps, remat, b, blocks_treedef, blocks_ndims,
    embed_treedef, topix_treedef, data_axes=(), loss_fields=None,
    feature_fn=None, charbonnier_weight=1.0,
):
    """Build (once per static configuration) the jitted per-shard GPipe VJP.

    A bare caller of ``pipeline_parallel_value_and_grad`` previously paid a
    full retrace of the schedule every step (a fresh ``jax.jit`` object per
    call); caching the jitted function on the static layout makes repeated
    calls — and the hoisted trainer — reuse one trace. Keys are hashable
    stand-ins for the pytrees: treedefs + leaf ndims rebuild the
    PartitionSpec trees exactly (``feature_fn`` hashes by identity — the
    trainer builds it once).

    ``data_axes`` adds data parallelism: every microbatch-row dimension is
    additionally sharded over those mesh axes (one pipeline replica per
    slice) and the grad/loss psums span ``(pipe, *data_axes)``.

    ``loss_fields = (cw, sw, pw, th, tw, n_tiles, patch, gr, gc)`` turns on
    the full reference loss stack *inside* the schedule: each shard
    unpatchifies its OWN drained microbatches to dense images, crops the
    caller-supplied tile indices, and adds SSIM (and, with ``feature_fn``,
    DINO-perceptual) partials — outputs never leave their stage-sharded
    layout, so the full loss costs no extra collectives beyond the scalar
    psums.
    """
    compute_dtype = jnp.dtype(dtype_name).type
    all_axes = (PIPE_AXIS,) + tuple(data_axes)
    n_shards = 1
    for a in all_axes:
        n_shards *= mesh.shape[a]
    dspec = data_axes if data_axes else None
    mb_sharded = P(None, PIPE_AXIS, dspec)
    micro_rep = P(None, dspec)

    block_specs = jax.tree_util.tree_unflatten(
        blocks_treedef,
        [P(*((PIPE_AXIS,) + (None,) * (nd - 1))) for nd in blocks_ndims],
    )
    rep = jax.tree_util.tree_unflatten(
        embed_treedef, [P()] * embed_treedef.num_leaves
    )
    rep_tp = jax.tree_util.tree_unflatten(
        topix_treedef, [P()] * topix_treedef.num_leaves
    )

    run = functools.partial(
        _pipeline_outputs,
        cfg=cfg, S=S, m=m, rounds=rounds, n_tok=n_tok, width=width, ppt=ppt,
        compute_dtype=compute_dtype, deterministic=False, remat=remat,
    )

    cw = charbonnier_weight
    if loss_fields is not None:
        sw, pw, tile_h, tile_w, n_tiles, patch, gr, gc = loss_fields
    else:
        sw, pw = 0.0, 0.0

    def _tile_losses(outputs, tgt, m0, oh, ow, sy, sx):
        """Stage-local SSIM/perceptual partials on this shard's images."""
        from vitok_tpu.losses import perceptual_loss, ssim_loss
        from vitok_tpu.pp.ops import sample_tiles

        rounds_l, mb_l = outputs.shape[0], outputs.shape[1]
        L = rounds_l * mb_l
        nv = gr * gc
        chans = ppt // (patch * patch)

        def dense(x):
            # Masked dense unpatchify (train_lib.unpatchify_dense_static on
            # the local shard): [L, N, ppt] -> [L, C, gr*p, gc*p].
            x = jnp.where(m0.reshape(L, n_tok)[..., None] > 0, x, 0.0)
            x = x[:, :nv].reshape(L, gr, gc, chans, patch, patch)
            return x.transpose(0, 3, 1, 4, 2, 5).reshape(
                L, chans, gr * patch, gc * patch
            )

        imgs_r = dense(outputs.reshape(L, n_tok, ppt).astype(jnp.float32))
        imgs_t = dense(tgt.reshape(L, n_tok, ppt))
        oh_f, ow_f = oh.reshape(L), ow.reshape(L)
        idx = (
            sy.reshape(L, n_tiles),
            sx.reshape(L, n_tiles),
        )
        tiles_r, _ = sample_tiles(
            imgs_r, oh_f, ow_f, n_tiles=n_tiles,
            tile_size=(tile_h, tile_w), indices=idx,
        )
        tiles_t, _ = sample_tiles(
            imgs_t, oh_f, ow_f, n_tiles=n_tiles,
            tile_size=(tile_h, tile_w), indices=idx,
        )
        bt = L * n_tiles
        flat_r = tiles_r.reshape(bt, *tiles_r.shape[2:])
        flat_t = tiles_t.reshape(bt, *tiles_t.shape[2:])
        # Every shard holds the same tile count, so mean-of-shard-means
        # (psum / n_shards) equals the global tile mean exactly.
        l_ssim = ssim_loss(flat_r, flat_t) / n_shards if sw else jnp.float32(0)
        l_perc = (
            perceptual_loss(feature_fn, flat_r, flat_t) / n_shards
            if (pw and feature_fn is not None)
            else jnp.float32(0)
        )
        return l_ssim, l_perc

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            block_specs, rep, rep_tp,
            mb_sharded, mb_sharded, mb_sharded,
            micro_rep, micro_rep, micro_rep,
            mb_sharded, mb_sharded, mb_sharded, mb_sharded,
        ),
        out_specs=(
            P(), block_specs, rep, rep_tp, mb_sharded, (P(), P(), P()),
        ),
        check_vma=False,
    )
    def local_vjg(
        local_blocks, embed_p, topix_p, z_local, tgt_local, lmask_local,
        coss, sins, masks, oh_local, ow_local, sy_local, sx_local,
    ):
        tgt = tgt_local[:, 0].astype(jnp.float32)  # [rounds, mb, N, ppt]
        m0 = lmask_local[:, 0].astype(jnp.float32)  # [rounds, mb, N]

        def loss_fn(bl, ep, tp, zl):
            outputs = run(bl, ep, tp, zl[:, 0], coss, sins, masks)
            diff = outputs.astype(jnp.float32) - tgt
            per_token = jnp.mean(
                jnp.sqrt(diff * diff + charbonnier_eps * charbonnier_eps),
                axis=-1,
            )  # [rounds, mb, N]
            per_image = jnp.sum(per_token * m0, axis=-1) / jnp.maximum(
                jnp.sum(m0, axis=-1), 1.0
            )
            # LOCAL partial of the global batch mean: this shard owns
            # rounds*mb of the b images; summing partials over shards
            # (psum below) completes charbonnier_loss exactly.
            l_char = jnp.sum(per_image) / b
            total = cw * l_char
            l_ssim = l_perc = jnp.float32(0)
            if loss_fields is not None and (sw or pw):
                l_ssim, l_perc = _tile_losses(
                    outputs, tgt, m0,
                    oh_local[:, 0], ow_local[:, 0],
                    sy_local[:, 0], sx_local[:, 0],
                )
                total = total + sw * l_ssim + pw * l_perc
            return total, (l_char, l_ssim, l_perc)

        (loss_local, parts), (g_bl, g_ep, g_tp, g_z) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True
        )(local_blocks, embed_p, topix_p, z_local)
        loss = jax.lax.psum(loss_local, all_axes)
        parts = tuple(jax.lax.psum(x, all_axes) for x in parts)
        # Block grads are stage-local by construction (no pipe psum: each
        # stage differentiates only its own slice) but sum over data
        # replicas. embed/to_pixels run on every stage but only one stage's
        # result is consumed (jnp.where), so the other stages' cotangents
        # are exact zeros — psum assembles the replicated grad. z grads
        # stay in the round-robin owner layout.
        if data_axes:
            g_bl = jax.tree_util.tree_map(
                lambda a: jax.lax.psum(a, data_axes), g_bl
            )
        g_ep = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a, all_axes), g_ep
        )
        g_tp = jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a, all_axes), g_tp
        )
        return loss, g_bl, g_ep, g_tp, g_z, parts

    # jit is required (not just advisable): the remat closed_call cannot be
    # evaluated eagerly inside shard_map. Callers jitting the enclosing train
    # step inline this trace.
    return jax.jit(local_vjg)


def pipeline_parallel_value_and_grad(
    params,
    encode_dict: Dict[str, Array],
    target_patches: Array,
    cfg,
    mesh: Mesh,
    num_microbatches: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
    charbonnier_eps: float = 1e-3,
    remat: bool = True,
    loss_cfg=None,
    feature_fn=None,
    tile_rng: Optional[Array] = None,
    return_metrics: bool = False,
):
    """Reconstruction loss + grads through the pipelined decoder.

    The training side of pipeline parallelism: reverse AD transposes the
    GPipe schedule in place (cotangents ``ppermute`` back up the stage
    line), so each chip computes and **keeps** the gradient of its own
    ``depth/S`` block slice — decoder-block grads return sharded over
    ``pipe`` exactly like the params, ready for a stage-local optimizer
    step. ``decoder_embed`` / ``to_pixels`` grads are psum-replicated, and
    the latent cotangent ``dz`` is returned so an encoder running outside
    the pipeline (data/tensor-parallel) can chain its backward. The
    reference has no pipeline training (SURVEY §2.9).

    On a ``(data, pipe)`` mesh each microbatch's rows additionally shard
    over ``data`` (one GPipe replica per slice; block grads psum across
    replicas) — the DDP×pipeline composition.

    Loss is masked Charbonnier by default; passing a ``train_lib.LossConfig``
    with ``ssim_grid`` set adds the reference's SSIM-tile (and, with
    ``feature_fn``, DINO-perceptual) branches computed *stage-locally* on
    each shard's own drained microbatches — tile origins are drawn once at
    batch level from ``tile_rng`` with the exact single-device RNG stream
    (``pp.ops.sample_tile_indices``), so the full pipelined loss equals
    ``train_lib.compute_loss`` to float tolerance.

    Runs deterministic (no drop-path): stochastic depth inside the rotating
    schedule would need per-(microbatch, layer) rng plumbing; the reference
    finetunes at high res with drop_path_rate=0, the one regime where a
    pipelined decoder matters.

    Returns:
        ``(loss, grads, dz)`` — scalar loss; ``grads`` keyed
        ``decoder_blocks`` (pipe-sharded), ``decoder_embed``, ``to_pixels``;
        ``dz [B, N, zdim]``. With ``return_metrics=True``, a 4th element:
        ``{"loss/charbonnier", "loss/ssim", "loss/perceptual"}``.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    b = encode_dict["z"].shape[0]
    m = num_microbatches or n_stages
    S = n_stages
    data_axes = _mesh_data_axes(mesh)
    rounds, mb = _validate_layout(cfg, b, S, m, mesh=mesh)

    z_sh, cos_micro, sin_micro, mask_micro, split, _, _ = _microbatch_layouts(
        encode_dict, cfg, m, S
    )
    z = encode_dict["z"]
    n_tok = z.shape[1]
    width = cfg.decoder_width
    ppt = params["to_pixels"]["kernel"].shape[-1]

    # Targets and loss mask live in the same round-robin stage layout as z.
    tgt_sh = split(target_patches).reshape(
        (rounds, S, mb) + target_patches.shape[1:]
    )
    lmask_sh = mask_micro.reshape((rounds, S, mb, n_tok))

    loss_fields = None
    want_tiles = (
        loss_cfg is not None
        and loss_cfg.ssim_grid is not None
        and (
            loss_cfg.ssim_weight
            or (loss_cfg.perceptual_weight and feature_fn is not None)
        )
    )
    oh = encode_dict.get("orig_height")
    ow = encode_dict.get("orig_width")
    if want_tiles:
        if oh is None or ow is None:
            raise ValueError(
                "SSIM/perceptual tile losses need orig_height/orig_width in "
                "the encode dict"
            )
        gr, gc = loss_cfg.ssim_grid
        th = min(loss_cfg.tile_size, gr * loss_cfg.patch)
        tw = min(loss_cfg.tile_size, gc * loss_cfg.patch)
        loss_fields = (
            float(loss_cfg.ssim_weight),
            float(loss_cfg.perceptual_weight),
            int(th), int(tw), int(loss_cfg.n_tiles), int(loss_cfg.patch),
            int(gr), int(gc),
        )
        from vitok_tpu.pp.ops import sample_tile_indices

        sy, sx = sample_tile_indices(
            oh, ow, n_tiles=loss_cfg.n_tiles, tile_size=(th, tw), rng=tile_rng
        )
        n_tiles = loss_cfg.n_tiles
    else:
        sy = sx = jnp.zeros((b, 1), jnp.int32)
        n_tiles = 1
        if oh is None:
            oh = jnp.zeros((b,), jnp.int32)
            ow = jnp.zeros((b,), jnp.int32)
    lay3 = lambda a: split(a).reshape((rounds, S, mb) + a.shape[1:])
    oh_sh, ow_sh = lay3(oh), lay3(ow)
    sy_sh, sx_sh = lay3(sy), lay3(sx)

    blocks = params["decoder_blocks"]
    vjg = _cached_vjg(
        cfg, mesh, S, m, rounds, n_tok, width, ppt,
        jnp.dtype(compute_dtype).name, float(charbonnier_eps), bool(remat),
        int(b),
        jax.tree_util.tree_structure(blocks),
        tuple(l.ndim for l in jax.tree_util.tree_leaves(blocks)),
        jax.tree_util.tree_structure(params["decoder_embed"]),
        jax.tree_util.tree_structure(params["to_pixels"]),
        data_axes, loss_fields, feature_fn,
        float(loss_cfg.charbonnier_weight) if loss_cfg is not None else 1.0,
    )
    loss, g_blocks, g_embed, g_topix, g_z, parts = vjg(
        blocks, params["decoder_embed"], params["to_pixels"],
        z_sh, tgt_sh, lmask_sh, cos_micro, sin_micro, mask_micro,
        oh_sh, ow_sh, sy_sh, sx_sh,
    )
    dz = g_z.reshape((b,) + z.shape[1:])
    grads = {
        "decoder_blocks": g_blocks,
        "decoder_embed": g_embed,
        "to_pixels": g_topix,
    }
    if return_metrics:
        metrics = {
            "loss/charbonnier": parts[0],
            "loss/ssim": parts[1],
            "loss/perceptual": parts[2],
        }
        return loss, grads, dz, metrics
    return loss, grads, dz


def pipeline_param_specs(mesh: Mesh):
    """Param path -> PartitionSpec for pipeline training.

    ``decoder_blocks`` shard their stacked depth axis over ``pipe`` (each
    stage holds its ``depth/S`` slice — params, grads, and optimizer moments
    all stay stage-local); everything else (encoder, embeds, heads) is
    replicated. Signature matches ``ae_param_specs``'s callable so it drops
    into ``shard_params(..., spec_fn=...)``.
    """
    del mesh

    def spec_for(path, leaf=None) -> P:
        keys = [getattr(k, "key", str(k)) for k in path]
        # P(PIPE_AXIS) with no trailing Nones: trailing dims are replicated
        # either way, but the normalized spelling matches what jit's
        # propagation emits on the step's outputs — so input and output
        # state shardings hash identically and the step never retraces.
        if "decoder_blocks" in keys:
            return P(PIPE_AXIS)
        return P()

    return spec_for


def make_pipeline_train_step(
    cfg,
    tx,
    mesh: Mesh,
    *,
    num_microbatches: Optional[int] = None,
    ema_decay: float = 0.999,
    compute_dtype=jnp.bfloat16,
    charbonnier_eps: float = 1e-3,
    remat: bool = True,
    donate: bool = True,
    loss_cfg=None,
    feature_fn=None,
    grad_accum: int = 1,
):
    """Full pipelined train step: DP encoder -> GPipe decoder -> optimizer.

    The decoder block stack runs pipelined over the ``pipe`` mesh axis
    (stage-local params, grads, and optimizer state); the encoder runs
    data-parallel over the remaining devices (batch rows sharded over
    ``(data, pipe)``), and its backward chains through the latent cotangent
    ``dz`` returned by the GPipe schedule. On a ``(data, pipe)`` mesh the
    schedule itself runs one replica per ``data`` slice with block grads
    psum'd across replicas. One hoisted ``jax.jit`` wraps the whole step —
    the cached inner schedule trace is inlined, so steps after the first
    pay no retrace.

    ``loss_cfg`` (a ``train_lib.LossConfig`` with ``ssim_grid``) enables the
    reference's full loss stack — masked Charbonnier + SSIM tiles +
    (with ``feature_fn``) DINO perceptual — computed stage-locally inside
    the schedule; ``None`` keeps masked Charbonnier only. ``grad_accum > 1``
    splits the batch into that many sequential chunks under one
    ``lax.scan`` with fp32 grad averaging (identical semantics to
    ``train_lib.make_train_step``, including per-chunk tile-rng fold-in).
    Drop-path stays 0 — the reference's high-res finetune regime
    (train_vae.py drop_path settings); stochastic depth would need
    per-(microbatch, layer) rng inside the rotating schedule.

    Returns ``(state, batch, rng) -> (state, metrics)`` like
    ``make_train_step``.
    """
    import optax

    from vitok_tpu.models.ae import _meta, encode_apply
    from vitok_tpu.train_lib import update_ema

    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    enc_keys = ("patch_embed", "encoder_blocks", "to_code")

    def chunk_grads(params, chunk, chunk_rng):
        """Loss + full-param grads for one batch chunk (one GPipe pass)."""
        # Mirror compute_loss's rng split exactly: (drop_rng, tile_rng).
        # drop_rng is unused (deterministic schedule), tile_rng seeds the
        # tile origins so pipelined tiles == single-device tiles.
        _, tile_rng = jax.random.split(chunk_rng)

        def enc_z(ep):
            out = encode_apply(
                {**params, **ep}, chunk, cfg,
                deterministic=False, compute_dtype=compute_dtype,
            )
            return out["z"]

        enc_params = {k: params[k] for k in enc_keys}
        z, enc_vjp = jax.vjp(enc_z, enc_params)

        enc_out = _meta(chunk)
        enc_out["z"] = z
        loss, dec_grads, dz, parts = pipeline_parallel_value_and_grad(
            params, enc_out, chunk["patches"], cfg, mesh,
            num_microbatches=num_microbatches,
            compute_dtype=compute_dtype,
            charbonnier_eps=charbonnier_eps,
            remat=remat,
            loss_cfg=loss_cfg,
            feature_fn=feature_fn,
            tile_rng=tile_rng,
            return_metrics=True,
        )
        (enc_grads,) = enc_vjp(dz.astype(z.dtype))
        grads = {**enc_grads, **dec_grads}
        metrics = {"loss/total": loss, **parts}
        if loss_cfg is None:
            metrics = {
                "loss/total": loss, "loss/charbonnier": parts["loss/charbonnier"]
            }
        return grads, metrics

    def step(state, batch, rng):
        params = state.params
        step_rng = jax.random.fold_in(rng, state.step)
        if grad_accum == 1:
            grads, metrics = chunk_grads(params, batch, step_rng)
        else:
            bsz = jax.tree_util.tree_leaves(batch)[0].shape[0]
            if bsz % grad_accum:
                raise ValueError(
                    f"batch size {bsz} not divisible by grad_accum "
                    f"{grad_accum}"
                )
            chunks = jax.tree_util.tree_map(
                lambda x: x.reshape(
                    (grad_accum, x.shape[0] // grad_accum) + x.shape[1:]
                ),
                batch,
            )

            def one(chunk, i):
                g, mtr = chunk_grads(
                    params, chunk, jax.random.fold_in(step_rng, i)
                )
                return (
                    jax.tree_util.tree_map(
                        lambda x: x.astype(jnp.float32), g
                    ),
                    mtr,
                )

            # eval_shape-seeded scan carry: the heavy GPipe graph is emitted
            # once, inside the scan body (CLAUDE.md: the remote compile
            # helper is fragile under doubled subgraphs).
            g_shape, m_shape = jax.eval_shape(
                one,
                jax.tree_util.tree_map(lambda x: x[0], chunks),
                jnp.int32(0),
            )
            zeros = lambda tree: jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), tree
            )

            def body(carry, xs):
                chunk, i = xs
                g, mtr = one(chunk, i)
                return (
                    jax.tree_util.tree_map(jnp.add, carry[0], g),
                    jax.tree_util.tree_map(jnp.add, carry[1], mtr),
                ), None

            (gacc, macc), _ = jax.lax.scan(
                body,
                (zeros(g_shape), zeros(m_shape)),
                (chunks, jnp.arange(grad_accum)),
            )
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum, gacc)
            metrics = jax.tree_util.tree_map(lambda x: x / grad_accum, macc)

        updates, new_opt = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_ema = (
            update_ema(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None
            else None
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        import dataclasses

        return (
            dataclasses.replace(
                state,
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt,
                ema_params=new_ema,
            ),
            metrics,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


__all__ = [
    "pipeline_parallel_decode",
    "pipeline_parallel_value_and_grad",
    "make_pipeline_train_step",
    "pipeline_param_specs",
    "PIPE_AXIS",
]
