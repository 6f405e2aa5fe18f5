"""Optimizer construction with reference semantics.

``build_optimizer`` mirrors reference train.py:139-152 (SGD + Nesterov
momentum + optional weight decay, or Adam). The learning rate is an
injected hyperparameter so the loop can implement ``set_lr``/``get_lr``
annealing (reference train.py:317-326) without re-jitting.
"""

from __future__ import annotations

import optax


def build_optimizer(optimizer: str = "sgd", lr: float = 3e-4,
                    momentum: float = 0.9, weight_decay: float = 0.0,
                    max_norm: float = 100.0) -> optax.GradientTransformation:
    """Gradient clip (reference train.py:622-623) + SGD/Adam."""
    chain = []
    if max_norm and max_norm > 0:
        chain.append(optax.clip_by_global_norm(max_norm))
    if optimizer == "sgd":
        def make(learning_rate):
            parts = []
            if weight_decay > 0:
                parts.append(optax.add_decayed_weights(weight_decay))
            parts.append(optax.sgd(learning_rate, momentum=momentum,
                                   nesterov=True))
            return optax.chain(*parts)
    elif optimizer == "adam":
        def make(learning_rate):
            return optax.adam(learning_rate)
    else:
        raise ValueError(f"unknown optimizer: {optimizer}")
    chain.append(optax.inject_hyperparams(make)(learning_rate=lr))
    return optax.chain(*chain)


def get_lr(opt_state) -> float:
    """Current learning rate (reference train.py:317-319)."""
    return float(_find_hyperparams(opt_state)["learning_rate"])


def set_lr(opt_state, lr: float):
    """Returns opt_state with a new learning rate (reference train.py:322-326)."""
    import jax

    hp = _find_hyperparams(opt_state)
    hp["learning_rate"] = jax.numpy.asarray(lr, dtype=hp["learning_rate"].dtype)
    return opt_state


def _find_hyperparams(opt_state):
    # optax.chain state is a tuple; inject_hyperparams state carries .hyperparams
    for s in opt_state:
        if hasattr(s, "hyperparams"):
            return s.hyperparams
    raise ValueError("no injected hyperparams found in optimizer state")
