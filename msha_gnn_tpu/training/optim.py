"""Optimisers matching the reference's torch configurations.

torch ``Adam(lr, weight_decay=wd)`` adds ``wd * param`` to the *gradient*
before the Adam moments (L2, not AdamW); the optax equivalent is
``add_decayed_weights`` ahead of ``adam`` in the chain.  Reference call
sites: ``train.py:207`` (lr 1e-3, wd 5e-4), ``LLP.py:299`` (lr 5e-3, wd 0),
``SGAE.py:79`` (lr 1e-3, wd 5e-4).
"""

from __future__ import annotations

import optax


def adam_l2(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
        )
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def sgd_momentum(lr: float, momentum: float = 0.9, weight_decay: float = 0.0):
    """The commented-out SGD alternative (``train.py:208``)."""
    tx = [optax.sgd(lr, momentum=momentum)]
    if weight_decay:
        tx = [optax.add_decayed_weights(weight_decay)] + tx
    return optax.chain(*tx)
