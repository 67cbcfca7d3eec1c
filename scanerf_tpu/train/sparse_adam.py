"""Sparse Adam: skip entries whose gradient is exactly zero.

Rebuild of the reference's "vdbAdam" capability (``cuda/adam_kernel.cu``:
``adam_step_cuda{,_fp16}`` skip zero-grad elements at :46-51; bound but
unused by the shipped trainer, which uses dense torch Adam —
SURVEY.md §2.3). For hash tables only a small fraction of the 2^21+ rows
receives gradient each step; dense Adam still decays both moments and
moves every parameter through the stale momentum, while sparse Adam
freezes untouched rows — the intended behavior for embedding-style
parameters.

optax-composable: ``scale_by_sparse_adam`` mirrors
``optax.scale_by_adam`` but masks moment updates and emitted updates with
``grad != 0``; per-element step counts give each entry its own bias
correction, matching the CUDA kernel's per-element semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class SparseAdamState(NamedTuple):
    count: optax.Updates  # per-element int32 step counts
    mu: optax.Updates
    nu: optax.Updates


def scale_by_sparse_adam(
    b1: float = 0.9, b2: float = 0.99, eps: float = 1e-15
) -> optax.GradientTransformation:
    def init_fn(params):
        return SparseAdamState(
            count=jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.int32), params
            ),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params

        def upd(g, c, m, v):
            active = g != 0
            c2 = c + active.astype(jnp.int32)
            m2 = jnp.where(active, b1 * m + (1 - b1) * g, m)
            v2 = jnp.where(active, b2 * v + (1 - b2) * g * g, v)
            cf = jnp.maximum(c2, 1).astype(g.dtype)
            m_hat = m2 / (1 - b1**cf)
            v_hat = v2 / (1 - b2**cf)
            step = jnp.where(active, m_hat / (jnp.sqrt(v_hat) + eps), 0.0)
            return step, c2, m2, v2

        flat = jax.tree_util.tree_map(upd, updates, state.count, state.mu, state.nu)
        outer = jax.tree_util.tree_structure(updates)
        inner = jax.tree_util.tree_structure((0, 0, 0, 0))
        steps, counts, mus, nus = jax.tree_util.tree_transpose(outer, inner, flat)
        return steps, SparseAdamState(count=counts, mu=mus, nu=nus)

    return optax.GradientTransformation(init_fn, update_fn)
