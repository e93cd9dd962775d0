"""Learning-rate schedules (optax), registered by name.

Mirrors the reference's schedulers
(/root/reference/spider/common/optims.py:13-119): linear warmup followed by
step or cosine decay, plus DeepSpeed's WarmupDecayLR (the one actually used by
`ds_config.json`).
"""

from __future__ import annotations

import math

import optax

from spider_tpu.common.registry import registry


@registry.register_lr_scheduler("linear_warmup_cosine_lr")
def linear_warmup_cosine_lr(init_lr: float, min_lr: float, warmup_steps: int,
                            total_steps: int, warmup_start_lr: float = -1.0,
                            **_unused) -> optax.Schedule:
    warmup_start_lr = init_lr if warmup_start_lr < 0 else warmup_start_lr

    def schedule(step):
        import jax.numpy as jnp

        warm = warmup_start_lr + (init_lr - warmup_start_lr) * jnp.minimum(
            step / max(warmup_steps, 1), 1.0
        )
        t = jnp.clip((step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        cos = min_lr + 0.5 * (init_lr - min_lr) * (1.0 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


@registry.register_lr_scheduler("linear_warmup_step_lr")
def linear_warmup_step_lr(init_lr: float, min_lr: float, warmup_steps: int,
                          decay_rate: float = 0.9, steps_per_epoch: int = 1,
                          warmup_start_lr: float = -1.0, **_unused) -> optax.Schedule:
    warmup_start_lr = init_lr if warmup_start_lr < 0 else warmup_start_lr

    def schedule(step):
        import jax.numpy as jnp

        warm = warmup_start_lr + (init_lr - warmup_start_lr) * jnp.minimum(
            step / max(warmup_steps, 1), 1.0
        )
        epoch = jnp.floor_divide(step, max(steps_per_epoch, 1))
        stepped = jnp.maximum(init_lr * (decay_rate ** epoch.astype("float32")), min_lr)
        return jnp.where(step < warmup_steps, warm, stepped)

    return schedule


@registry.register_lr_scheduler("warmup_decay_lr")
def warmup_decay_lr(init_lr: float, warmup_steps: int, total_steps: int,
                    min_lr: float = 0.0, **_unused) -> optax.Schedule:
    """DeepSpeed WarmupDecayLR: linear warmup then linear decay to zero
    (the schedule `train_configs/ds_config.json` actually applies)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = init_lr * jnp.minimum(step / max(warmup_steps, 1), 1.0)
        t = jnp.clip((step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0)
        decay = jnp.maximum(init_lr * (1.0 - t), min_lr)
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def build_schedule(name: str, **kwargs) -> optax.Schedule:
    fn = registry.get_lr_scheduler_class(name)
    if fn is None:
        raise KeyError(f"unknown lr scheduler '{name}'")
    return fn(**kwargs)
