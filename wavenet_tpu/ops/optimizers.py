"""Optimizer factory with the reference's exact hyperparameter quirks.

Reference (wavenet/ops.py ≈:5-20):
  * adam    -> tf.train.AdamOptimizer(epsilon=1e-4)   (eps OUTSIDE the sqrt)
  * sgd     -> tf.train.MomentumOptimizer(lr, momentum)
  * rmsprop -> tf.train.RMSPropOptimizer(lr, momentum, epsilon=1e-5)
               (eps INSIDE the sqrt, decay 0.9)

optax equivalents, epsilon placement checked against the TF1 update rules:
optax.adam's default eps is added after the sqrt (eps_root=0) like TF Adam;
optax.rmsprop(eps_in_sqrt=True) matches TF RMSProp; optax.sgd's trace
accumulator is TF's momentum accumulator.
"""

from __future__ import annotations

import optax


def create_adam_optimizer(learning_rate: float, momentum: float | None = None
                          ) -> optax.GradientTransformation:
    del momentum  # the reference's adam path ignores momentum too
    return optax.adam(learning_rate, eps=1e-4)


def create_sgd_optimizer(learning_rate: float, momentum: float
                         ) -> optax.GradientTransformation:
    return optax.sgd(learning_rate, momentum=momentum)


def create_rmsprop_optimizer(learning_rate: float, momentum: float
                             ) -> optax.GradientTransformation:
    return optax.rmsprop(learning_rate, decay=0.9, eps=1e-5,
                         momentum=momentum, eps_in_sqrt=True)


optimizer_factory = {
    "adam": create_adam_optimizer,
    "sgd": create_sgd_optimizer,
    "rmsprop": create_rmsprop_optimizer,
}
