"""Optimizer and LR-schedule factories (optax).

Reproduces the reference's optimization setup: adam/adamw/radam with an
exponential decay from ``learning_rate`` to ``min_learning_rate`` over
``max_train_steps`` (``turbdiff/models/diffusion.py:210-235``), composed with
global-norm gradient clipping (``config/train.yaml:30``).
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def exp_decay_schedule(
    learning_rate: float, min_learning_rate: float, max_train_steps: int
):
    """lr(step) = lr0 * exp(log(min/lr0) * min(step, T) / T)."""
    log_ratio = math.log(min_learning_rate / learning_rate)

    def schedule(step):
        import jax.numpy as jnp

        frac = jnp.minimum(step, max_train_steps) / max_train_steps
        return learning_rate * jnp.exp(log_ratio * frac)

    return schedule


def build_optimizer(
    *,
    optimizer: str,
    learning_rate: float,
    min_learning_rate: float = 1e-6,
    lr_decay: Optional[str] = None,
    max_train_steps: int = 1,
    gradient_clip_val: Optional[float] = 0.1,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    if lr_decay == "exp":
        lr = exp_decay_schedule(learning_rate, min_learning_rate, max(1, max_train_steps))
    elif lr_decay == "cosine":
        lr = optax.cosine_decay_schedule(
            learning_rate,
            max(1, max_train_steps),
            alpha=min_learning_rate / learning_rate,
        )
    elif lr_decay is None:
        lr = learning_rate
    else:
        raise ValueError(f"Unknown lr decay {lr_decay!r}")

    makers = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "radam": optax.radam,
    }
    try:
        opt = makers[optimizer](learning_rate=lr)
    except KeyError:
        raise ValueError(f"Unknown optimizer {optimizer!r}") from None

    parts = []
    if gradient_clip_val is not None and gradient_clip_val > 0:
        parts.append(optax.clip_by_global_norm(gradient_clip_val))
    parts.append(opt)
    tx = optax.chain(*parts)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
