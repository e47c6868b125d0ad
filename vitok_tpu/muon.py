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


def newton_schulz_orthogonalize(g: jax.Array, steps: int = 4) -> jax.Array:
    """Approximate the orthogonal polar factor of ``g`` ([..., m, n]).

    Quintic Newton-Schulz in bf16 (MXU-friendly), on the transposed problem
    when m > n for the cheaper Gram matrix. Two cost cuts vs the textbook
    form (~30% less measured step time at equal spectrum quality — what
    keeps Muon's step-time overhead small at 350M scale):

    * **gram-norm start**: the first iteration's Gram matrix ``G = X Xᵀ``
      doubles as the normalizer — ``sigma_max <= ||G||_F^(1/2)`` (a
      ~6x tighter bound than ``||X||_F = trace(G)^(1/2)`` on
      near-isotropic inputs), so the quintic starts closer to 1 and 4
      steps match Frobenius-start 5-step quality at zero extra matmuls.
      (A power-iteration estimate is tighter still but its sequential
      matvecs measured +29 ms across the 350M leaves — slower overall.)
    * **polynomial form**: per step compute ``G = X Xᵀ`` once, then
      ``X <- a X + (b G + c G²) X`` — 2·m²·n + m³ multiplies instead of
      the textbook 3·m²·n (m <= n after the transpose, so m³ <= m²n).
    """
    a, b, c = _NS_COEFFS
    m, n = g.shape[-2], g.shape[-1]
    transpose = m > n
    x = g.astype(jnp.bfloat16)
    if transpose:
        x = jnp.swapaxes(x, -1, -2)

    def gram_of(x):
        return jnp.einsum(
            "...ij,...kj->...ik", x, x, preferred_element_type=jnp.float32
        )

    def poly_step(x, gram_b):
        gram2 = jnp.einsum(
            "...ij,...jk->...ik", gram_b, gram_b,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        poly = b * gram_b + c * gram2
        return a * x + jnp.einsum(
            "...ij,...jk->...ik", poly, x, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    # First gram (fp32, unnormalized) provides the spectral bound AND
    # iteration 1: sigma_max(X)^2 = lambda_max(G) <= ||G||_F.
    g1 = gram_of(x)
    sigma2 = jnp.sqrt(
        jnp.sum(g1 * g1, axis=(-2, -1), keepdims=True)
    ) + 1e-12  # >= sigma_max^2
    sigma = jnp.sqrt(sigma2)
    x = (x.astype(jnp.float32) / sigma).astype(jnp.bfloat16)
    x = poly_step(x, (g1 / sigma2).astype(jnp.bfloat16))

    for _ in range(max(steps - 1, 0)):
        x = poly_step(x, gram_of(x).astype(jnp.bfloat16))

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
    ns_steps: int = 4,
    moment_dtype=None,
) -> optax.GradientTransformation:
    """NS-orthogonalized momentum direction (unscaled; chain with lr).

    ``moment_dtype`` (e.g. bf16) stores the momentum buffer in reduced
    precision — the NS input is cast to bf16 anyway, so the update is
    unaffected beyond EMA rounding; it halves optimizer-state HBM traffic.
    """

    def init(params):
        return ScaleByMuonState(
            momentum=jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(
                    p, dtype=moment_dtype or p.dtype
                ),
                params,
            )
        )

    def update(grads, state, params=None):
        new_mom = jax.tree_util.tree_map(
            lambda m, g: (momentum * m.astype(g.dtype) + g).astype(m.dtype),
            state.momentum, grads,
        )

        def direction(m, g):
            m = m.astype(g.dtype)
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
    ns_steps: int = 4,
    adam_b1: float = 0.9,
    adam_b2: float = 0.99,
    adam_lr_scale: float = 1.0,
    moment_dtype=None,
) -> optax.GradientTransformation:
    """Muon for matrix params + Adam for the rest (reference: momentum 0.95)."""

    muon_tx = optax.chain(
        scale_by_muon(momentum, nesterov, ns_steps, moment_dtype),
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
