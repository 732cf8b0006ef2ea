"""Parameter freezing utilities.

Counterpart of the reference's ``freeze_model``/``unfreeze_model``
(`/root/reference/utils.py:64-70`), which flip ``requires_grad`` in place.
In JAX, freezing is an optimizer concern: ``frozen_mask`` builds a pytree
mask (True = frozen) over the trainer's ``params`` dict, and
``masked_optimizer`` wraps any optax transform so frozen subtrees receive
zero updates.

Example — freeze the pretrained autoencoder during e2e fine-tuning::

    tx = masked_optimizer(optax.adam(1e-4), params,
                          frozen=("encoder", "decoder"))
"""

from __future__ import annotations

from typing import Iterable

import jax
import optax


def frozen_mask(params, frozen: Iterable[str]):
    """Pytree mask matching ``params``: True where the top-level module name
    is in ``frozen``."""
    frozen = set(frozen)
    return {
        name: jax.tree_util.tree_map(lambda _: name in frozen, sub)
        for name, sub in params.items()
    }


def masked_optimizer(tx: optax.GradientTransformation, params,
                     frozen: Iterable[str]) -> optax.GradientTransformation:
    """Apply ``tx`` everywhere except the frozen top-level modules."""
    mask = frozen_mask(params, frozen)
    not_mask = jax.tree_util.tree_map(lambda b: not b, mask)
    return optax.chain(
        optax.masked(tx, not_mask),
        optax.masked(optax.set_to_zero(), mask),
    )
