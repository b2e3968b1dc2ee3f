"""Optimizers — counterpart of src/python/python/ad/optimizers.py (which
re-exports drjit.opt Adam/SGD; here optax provides the update rules and
this module provides the reference's ergonomic dict-style wrapper).

    opt = mi.ad.Adam(lr=0.05, params={'em_radiance': scene.em_radiance})
    for it in range(n):
        scene = scene.replace(**opt.params)
        loss, grads = jax.value_and_grad(loss_fn)(opt.params)
        opt.step(grads)
"""
from __future__ import annotations

import jax
import optax


class Optimizer:
    def __init__(self, tx, params: dict):
        self.tx = tx
        self.params = dict(params)
        self.state = tx.init(self.params)

    def step(self, grads: dict):
        updates, self.state = self.tx.update(grads, self.state, self.params)
        self.params = optax.apply_updates(self.params, updates)
        return self.params

    def __getitem__(self, k):
        return self.params[k]

    def __setitem__(self, k, v):
        # resetting a parameter re-initializes its optimizer state slot
        self.params[k] = v
        self.state = self.tx.init(self.params)

    def items(self):
        return self.params.items()


def Adam(lr=0.01, beta_1=0.9, beta_2=0.999, params=None, mask=None):
    tx = optax.adam(lr, b1=beta_1, b2=beta_2)
    return Optimizer(tx, params or {})


def SGD(lr=0.01, momentum=0.0, params=None):
    tx = optax.sgd(lr, momentum=momentum)
    return Optimizer(tx, params or {})


def RMSProp(lr=0.01, params=None):
    return Optimizer(optax.rmsprop(lr), params or {})
