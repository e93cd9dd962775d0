"""Parameter/optimizer sharding rules — the ZeRO/TP analogue.

The reference gets data parallelism + optimizer-state sharding from DeepSpeed
ZeRO-2 (/root/reference/train_configs/ds_config.json) and has TP machinery at
mp_size=1 (/root/reference/demo/inference_api.py:6-8,152-176). Here both are
sharding rules over the (data, fsdp, model, expert) mesh:
  * params/optimizer state shard over `fsdp` (ZeRO-equivalent) and `model`
    (real tensor parallelism) axes;
  * gradients reduce over `data` x `fsdp` automatically under jit;
  * frozen embedding rows become an update MASK instead of the reference's
    gather-and-overwrite (cf. runner_base.py:256-311).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-regex, PartitionSpec) — first match wins. Paths are '/'-joined key
# strings of the flax param tree; scanned layers have a leading [L] axis.
LLAMA_RULES: List[Tuple[str, P]] = [
    # attention / mlp projections, stacked [L, in, out]
    (r"(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel(_q)?$", P(None, "fsdp", "model")),
    (r"(o_proj|down_proj)/kernel(_q)?$", P(None, "model", "fsdp")),
    (r"(q_proj|k_proj|v_proj|gate_proj|up_proj)/kernel_scale$", P(None, "model")),
    (r"(o_proj|down_proj)/kernel_scale$", P(None, "fsdp")),
    (r"lora_a$", P(None, "fsdp", None)),
    (r"lora_b$", P(None, None, "model")),
    # MoE FFN: experts over the expert axis (EP), [L, E, in, out]
    (r"mlp/w1$", P(None, "expert", "fsdp", "model")),
    (r"mlp/w2$", P(None, "expert", "model", "fsdp")),
    (r"mlp/wg$", P(None, "fsdp", None)),
    # embeddings / head (kernel_q covers int8/int4 serving params: the
    # 4096x128256 lm_head is the single largest matrix and must TP-shard).
    # The embedding shards VOCAB-only (combined fsdp x model — same 1/N
    # memory as the old P('model','fsdp')): the doubly-sharded table made
    # the token-gather emit H-sharded outputs that fight the batch-major
    # activations ("involuntary full rematerialization", 6 warnings -> 1
    # measured on the dp2xfsdp2xtp2 Spider step; the residual one is the
    # 8 KB aligner query_embs grad accumulation — negligible).
    (r"embed_tokens/embedding$", P(("fsdp", "model"), None)),
    (r"lm_head/kernel(_q)?$", P("fsdp", "model")),
    (r"lm_head/kernel_scale$", P("model")),
    # norms and everything else: replicated
    (r".*", P()),
]

# Full-Spider training (LLM + input proj + aligners + SAM decoder — the
# reference trains this whole bundle under ZeRO-2, runner_base.py:101-108).
# The LLM subtree lives under 'llm/...' so the LLAMA_RULES regexes still
# match; aligner/projection/SAM matrices get a generic last-dim fsdp shard
# (ZeRO-style memory spreading; _validate_spec drops axes that don't divide).
SPIDER_RULES: List[Tuple[str, P]] = LLAMA_RULES[:-1] + [
    # Aligners are deliberately REPLICATED: their leaves are small
    # ([512,512]-class; 163M total for the full MoE aligner) and
    # fsdp-sharding them makes the SPMD partitioner fight per-op over
    # transposed layouts in the backward pass ("Involuntary full
    # rematerialization" warnings on every TextFcLayer grad accumulation).
    # Replication costs <0.7 GiB/device at full size and keeps the
    # aligner math local; the big memory (LLM, SAM encoder) still shards.
    (r"(aligners|moe_aligner)/", P()),
    (r"(llama_proj|sam)/.*(kernel|embedding)$", P(None, "fsdp")),
    (r".*", P()),
]


def path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for(path: str, rules: List[Tuple[str, P]], ndim: int) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            # Trim/pad the spec to the leaf's rank.
            entries = tuple(spec) if len(spec) else ()
            if len(entries) > ndim:
                entries = entries[-ndim:] if ndim > 0 else ()
            elif len(entries) < ndim:
                entries = (None,) * (ndim - len(entries)) + tuple(entries)
            # Drop axis annotations on dims the leaf can't shard evenly —
            # checked later against the mesh in shard_params.
            return P(*entries)
    return P()


def tree_partition_specs(tree, rules: Optional[List[Tuple[str, P]]] = None):
    """PartitionSpec pytree matching `tree`."""
    rules = rules or LLAMA_RULES

    def leaf_spec(path, leaf):
        return spec_for(path_str(path), rules, np.ndim(leaf))

    return jax.tree_util.tree_map_with_path(leaf_spec, tree)


def _validate_spec(spec: P, shape, mesh: Mesh) -> P:
    """Replace axis entries that don't divide the dim with None."""
    entries = []
    for dim, entry in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if entry is None:
            entries.append(None)
            continue
        axes = entry if isinstance(entry, tuple) else (entry,)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        entries.append(entry if dim % size == 0 else None)
    return P(*entries)


def tree_shardings(tree, mesh: Mesh,
                   rules: Optional[List[Tuple[str, P]]] = None):
    """NamedSharding pytree (validated against the mesh) for `tree`."""
    specs = tree_partition_specs(tree, rules)

    def to_sharding(spec, leaf):
        spec = _validate_spec(spec, np.shape(leaf), mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(to_sharding, specs, tree)


def shard_params(params, mesh: Mesh,
                 rules: Optional[List[Tuple[str, P]]] = None):
    """Place a param tree onto the mesh according to the rules."""
    shardings = tree_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


# ---------------------------------------------------------------------------
# Frozen-row embedding updates (reference: re-pin old rows after each step,
# runner_base.py:256-311; here: zero their updates inside the optimizer).
# ---------------------------------------------------------------------------

def freeze_embedding_rows(num_frozen_rows: int,
                          row_param_patterns: Tuple[str, ...] = (
                              r"embed_tokens/embedding$", r"lm_head/kernel$"),
                          ) -> optax.GradientTransformation:
    """Zero updates to the first `num_frozen_rows` rows of matched params.

    For `embedding` the row axis is 0 (vocab); for `lm_head/kernel` the vocab
    axis is 1 ([H, V]), handled per pattern.
    """

    def init_fn(params):
        return optax.EmptyState()

    def mask_leaf(path, u):
        p = path_str(path)
        if not any(re.search(pat, p) for pat in row_param_patterns):
            return u
        if re.search(r"embedding$", p):        # [V, H]: vocab axis 0
            keep = jnp.arange(u.shape[0]) >= num_frozen_rows
            return u * keep[:, None].astype(u.dtype)
        if re.search(r"lm_head/kernel$", p):   # [H, V]: vocab axis 1
            keep = jnp.arange(u.shape[1]) >= num_frozen_rows
            return u * keep[None, :].astype(u.dtype)
        return u

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map_with_path(mask_leaf, updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def trainable_mask(params, trainable_patterns: Tuple[str, ...]):
    """Boolean pytree: True where the param path matches any pattern —
    feeds optax.masked to freeze everything else (LoRA-style training)."""

    def f(path, leaf):
        p = path_str(path)
        return any(re.search(pat, p) for pat in trainable_patterns)

    return jax.tree_util.tree_map_with_path(f, params)
