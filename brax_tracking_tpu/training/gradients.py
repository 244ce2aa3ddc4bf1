"""Gradient update with cross-shard averaging.

Re-provides brax.training.gradients' capability (reference binding:
/root/reference/custom_brax/custom_ppo.py:15, 246-248): value_and_grad +
mean-reduction of gradients over the data-parallel axis + optax apply.

TPU difference: the reduction axis is a *mesh* axis name used inside
shard_map/pjit rather than a pmap axis — same math (lax.pmean), transport
over ICI/DCN chosen by XLA (SURVEY.md §5 "Distributed communication
backend").
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def loss_and_pgrad(
    loss_fn: Callable, pmap_axis_name: Optional[str], has_aux: bool = False
):
    g = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def h(*args, **kwargs):
        value, grad = g(*args, **kwargs)
        return value, jax.lax.pmean(grad, axis_name=pmap_axis_name)

    return g if pmap_axis_name is None else h


def gradient_update_fn(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    pmap_axis_name: Optional[str],
    has_aux: bool = False,
):
    """Returns f(*args, optimizer_state) -> (loss, params, new_opt_state).

    ``args[0]`` must be the params pytree (differentiated argument).
    """
    loss_and_pgrad_fn = loss_and_pgrad(
        loss_fn, pmap_axis_name=pmap_axis_name, has_aux=has_aux
    )

    def f(*args, optimizer_state):
        value, grads = loss_and_pgrad_fn(*args)
        params_update, optimizer_state = optimizer.update(grads, optimizer_state)
        params = optax.apply_updates(args[0], params_update)
        return value, params, optimizer_state

    return f
