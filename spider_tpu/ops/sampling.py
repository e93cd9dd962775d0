"""Token sampling for autoregressive decode (greedy / temperature / top-p).

All functions are jit-friendly: static shapes, no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """logits [B, V] -> token ids [B]."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_top_p(logits: jnp.ndarray, key: jax.Array, *, temperature: float = 1.0,
                 top_p: float = 1.0) -> jnp.ndarray:
    """Nucleus sampling. logits [B, V] -> token ids [B]."""
    if temperature <= 0.0:
        return greedy(logits)
    logits = logits / temperature
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep tokens until cumulative prob exceeds top_p (always keep top-1).
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # [B]
        cutoff_val = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff_val, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
