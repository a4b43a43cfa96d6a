"""Optimizer / LR schedule factory.

The reference trains with ``PolyOptimizer`` — SGD whose lr decays as
``lr * (1 - step/max_step) ** 0.9`` applied inside ``.step()``
(``tool/torchutils.py:10-31``). In optax this is a schedule composed with
SGD.

Reference quirk, reproduced behind a flag: ``PolyOptimizer.__init__`` calls
``SGD(params, lr, weight_decay)`` positionally, so the intended weight decay
(5e-4) lands in torch SGD's ``momentum`` argument; the reference therefore
actually runs with momentum=5e-4 and weight_decay=0, while the poly *power*
comes from ``self.momentum = 0.9``.
"""

from __future__ import annotations

import optax


def poly_schedule(base_lr: float, max_step: int, power: float = 0.9) -> optax.Schedule:
    """lr(step) = base_lr * (1 - step/max_step) ** power, floored at step >= max_step.

    Matches the reference's in-step decay (``tool/torchutils.py:22-26``):
    the multiplier is computed from the pre-increment global step and frozen
    once step >= max_step.
    """

    def schedule(step):
        import jax.numpy as jnp

        frac = jnp.clip(1.0 - step / max_step, 0.0, 1.0)
        return base_lr * frac ** power

    return schedule


def make_optimizer(
    lr: float,
    max_step: int,
    weight_decay: float = 5e-4,
    momentum: float = 0.9,
    power: float = 0.9,
    reference_quirk: bool = False,
    clip_grad_norm: float = 0.0,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """SGD + poly decay, the reference training recipe.

    With ``reference_quirk`` the torch-SGD argument mixup is reproduced:
    momentum := weight_decay, weight_decay := 0. ``clip_grad_norm`` adds
    global-norm clipping (off by default — the reference has none; useful
    for from-scratch runs where the alpha-weighted consistency gradients
    explode without ImageNet initialization). ``accum_steps`` > 1 wraps the
    whole chain in gradient accumulation (``optax.MultiSteps``): each call
    contributes one micro-batch; parameters update every ``accum_steps``
    calls with the mean gradient — a capability the reference lacks
    entirely (its effective batch is fixed at 1/GPU x world size); lets a
    single chip train at the reference's 4-GPU effective batch or beyond.
    ``max_step`` counts OPTIMIZER updates, so the poly schedule is
    unaffected by accumulation.
    """
    if reference_quirk:
        momentum, weight_decay = weight_decay, 0.0

    parts = []
    if clip_grad_norm:
        parts.append(optax.clip_by_global_norm(clip_grad_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(learning_rate=poly_schedule(lr, max_step, power),
                           momentum=momentum if momentum else None))
    tx = optax.chain(*parts)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
