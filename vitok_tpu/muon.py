"""Muon optimizer (MomentUm Orthogonalized by Newton-Schulz) for optax.

Capability parity with the reference trainer's ``--optimizer muon`` option
(``scripts/train_vae.py:196-198`` in Na-VAE/vitok-release, which imports the
external ``muon`` package). TPU-native implementation: the Newton-Schulz
orthogonalization is five bf16 matmul iterations per 2-D weight — pure MXU
work that composes with pjit sharding like any other pytree op.

Matrix params (leaf name "kernel"; scan-stacked weights orthogonalize per
depth slice) get orthogonalized momentum; everything else (norm scales,
biases, gains, embeddings) gets Adam — partitioned with
``optax.multi_transform`` so neither branch allocates state for the other's
parameters (a full Adam state over 5B matrix params would be ~40GB of
wasted fp32 moments).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

Params = Any

# Quintic Newton-Schulz coefficients (standard Muon constants — tuned for
# fast convergence of the polar factor in ~5 iterations).
_NS_COEFFS = (3.4445, -4.7750, 2.0315)


def newton_schulz_orthogonalize(g: jax.Array, steps: int = 5) -> jax.Array:
    """Approximate the orthogonal polar factor of ``g`` ([..., m, n]).

    Runs the quintic Newton-Schulz iteration in bf16 (MXU-friendly), on the
    transposed problem when m > n for the cheaper Gram matrix.
    """
    a, b, c = _NS_COEFFS
    m, n = g.shape[-2], g.shape[-1]
    transpose = m > n
    x = g.astype(jnp.bfloat16)
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    norm = jnp.sqrt(
        jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(-2, -1), keepdims=True)
    )
    x = (x.astype(jnp.float32) / (norm + 1e-7)).astype(jnp.bfloat16)

    def body(_, x):
        xxt = jnp.einsum(
            "...ij,...kj->...ik", x, x, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        bx = b * x + c * jnp.einsum(
            "...ij,...jk->...ik", xxt, x, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        return a * x + jnp.einsum(
            "...ij,...jk->...ik", xxt, bx, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    x = jax.lax.fori_loop(0, steps, body, x)
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    return x


class ScaleByMuonState(NamedTuple):
    momentum: Params


def _is_matrix(path, p) -> bool:
    """Muon applies to weight matrices; stacked scan params [depth, in, out]
    qualify (orthogonalized per depth slice). 1-D-per-depth params do not."""
    name = getattr(path[-1], "key", "")
    return p.ndim >= 2 and name in ("kernel",)


def scale_by_muon(
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
) -> optax.GradientTransformation:
    """NS-orthogonalized momentum direction (unscaled; chain with lr)."""

    def init(params):
        return ScaleByMuonState(
            momentum=jax.tree_util.tree_map(jnp.zeros_like, params)
        )

    def update(grads, state, params=None):
        new_mom = jax.tree_util.tree_map(
            lambda m, g: momentum * m + g, state.momentum, grads
        )

        def direction(m, g):
            mg = momentum * m + g if nesterov else m
            ortho = newton_schulz_orthogonalize(mg, ns_steps)
            rows, cols = mg.shape[-2], mg.shape[-1]
            scale = max(1.0, rows / cols) ** 0.5
            return (scale * ortho).astype(g.dtype)

        updates = jax.tree_util.tree_map(direction, new_mom, grads)
        return updates, ScaleByMuonState(momentum=new_mom)

    return optax.GradientTransformation(init, update)


def muon(
    learning_rate: optax.ScalarOrSchedule,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
    adam_b1: float = 0.9,
    adam_b2: float = 0.99,
    adam_lr_scale: float = 1.0,
) -> optax.GradientTransformation:
    """Muon for matrix params + Adam for the rest (reference: momentum 0.95)."""

    muon_tx = optax.chain(
        scale_by_muon(momentum, nesterov, ns_steps),
        optax.scale_by_learning_rate(learning_rate),  # negates
    )
    adam_lr = (
        (lambda c: adam_lr_scale * learning_rate(c))
        if callable(learning_rate)
        else adam_lr_scale * learning_rate
    )
    adam_tx = optax.adam(adam_lr, b1=adam_b1, b2=adam_b2)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, p: "muon" if _is_matrix(path, p) else "adam", params
        )

    return optax.multi_transform(
        {"muon": muon_tx, "adam": adam_tx}, label_fn
    )


__all__ = ["muon", "scale_by_muon", "newton_schulz_orthogonalize"]
