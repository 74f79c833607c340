"""Fully-factorized learned entropy bottleneck (Balle et al. 2018, appendix).

The per-channel integrated density c(x) is a monotone MLP-like chain of K+1
layers: logits = softplus(H_k) @ logits + b_k, with an elementwise
logits += tanh(a_k) * tanh(logits) gate between layers. The likelihood of an
(approximately) quantized value is c(x + 0.5) - c(x - 0.5) where
c = sigmoid(logits).

This is the on-device replacement for the compressai EntropyBottleneck the
reference instantiates at /root/reference/dmc/models/base_model.py:63. The
learned `quantiles` (tail/median targets) train through a separate auxiliary
loss with the density parameters frozen, mirroring the reference's dual-Adam
setup (/root/reference/dmc/train.py:251-282); in JAX the two losses get their
own grad computations so no gradient cross-contamination can happen.

Likelihood math stays in fp32 — entropy estimates are precision-sensitive near
|x - median| = 0.5 boundaries.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.bound import lower_bound, LOWER_BOUND_LIKELIHOOD
from ..ops.quant import additive_uniform_noise


class FactorizedEntropyBottleneck(nn.Module):
    """Learned factorized prior over a (B, H, W, C) latent."""

    channels: int
    filters: Sequence[int] = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        f = (1,) + tuple(self.filters) + (1,)
        k = len(self.filters)
        scale = self.init_scale ** (1.0 / (k + 1))
        matrices, biases, factors = [], [], []
        for i in range(k + 1):
            init = math.log(math.expm1(1.0 / scale / f[i + 1]))
            matrices.append(
                self.param(
                    f"matrix_{i}",
                    lambda key, shape, v=init: jnp.full(shape, v, jnp.float32),
                    (self.channels, f[i + 1], f[i]),
                )
            )
            biases.append(
                self.param(
                    f"bias_{i}",
                    lambda key, shape: jax.random.uniform(
                        key, shape, jnp.float32, -0.5, 0.5
                    ),
                    (self.channels, f[i + 1], 1),
                )
            )
            if i < k:
                factors.append(
                    self.param(
                        f"factor_{i}",
                        nn.initializers.zeros,
                        (self.channels, f[i + 1], 1),
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors
        # Learned (lower-tail, median, upper-tail) points; trained only by the
        # auxiliary loss. The trailing name 'quantiles' is the partition key
        # the dual-optimizer setup filters on.
        self.quantiles = self.param(
            "quantiles",
            lambda key, shape: jnp.tile(
                jnp.array(
                    [-self.init_scale, 0.0, self.init_scale], jnp.float32
                ),
                (self.channels, 1, 1),
            ),
            (self.channels, 1, 3),
        )

    def _logits_cumulative(self, inputs: jax.Array, stop_density_grad: bool):
        """inputs: (C, 1, N) -> logits of the cumulative, same shape."""
        maybe_sg = jax.lax.stop_gradient if stop_density_grad else (lambda a: a)
        logits = inputs
        k = len(self.filters)
        for i in range(k + 1):
            m = jax.nn.softplus(maybe_sg(self._matrices[i]))
            logits = jnp.einsum("cij,cjn->cin", m, logits)
            logits = logits + maybe_sg(self._biases[i])
            if i < k:
                a = jnp.tanh(maybe_sg(self._factors[i]))
                logits = logits + a * jnp.tanh(logits)
        return logits

    def _likelihood(self, values: jax.Array) -> jax.Array:
        """values: (C, 1, N) -> P(v - 0.5 <= V < v + 0.5), numerically stable."""
        lower = self._logits_cumulative(values - 0.5, stop_density_grad=False)
        upper = self._logits_cumulative(values + 0.5, stop_density_grad=False)
        sign = -jnp.sign(jax.lax.stop_gradient(lower + upper))
        return jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
        )

    def medians(self) -> jax.Array:
        """Per-channel density medians, shape (C,). Gradient-stopped."""
        return jax.lax.stop_gradient(self.quantiles[:, 0, 1])

    def __call__(
        self, x: jax.Array, training: bool, noise_key: jax.Array | None = None
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (x_tilde, likelihoods), both shaped like x (B, H, W, C).

        Training: x_tilde = x + U(-.5, .5); eval: round-to-integer around the
        channel median (the deterministic coder behaviour).
        """
        B, H, W, C = x.shape
        xf = x.astype(jnp.float32)
        if training:
            if noise_key is None:
                raise ValueError("training=True requires a noise_key")
            x_tilde = additive_uniform_noise(noise_key, xf)
        else:
            med = self.medians()[None, None, None, :]
            x_tilde = jnp.round(xf - med) + med
        # (B, H, W, C) -> (C, 1, B*H*W)
        perm = x_tilde.transpose(3, 0, 1, 2).reshape(C, 1, -1)
        lk = self._likelihood(perm)
        lk = lower_bound(lk, LOWER_BOUND_LIKELIHOOD)
        lk = lk.reshape(C, B, H, W).transpose(1, 2, 3, 0)
        return x_tilde.astype(x.dtype), lk

    def aux_loss(self) -> jax.Array:
        """|c(quantiles) - targets| with the density frozen; trains quantiles."""
        logits = self._logits_cumulative(self.quantiles, stop_density_grad=True)
        target = math.log(2.0 / self.tail_mass - 1.0)
        targets = jnp.array([-target, 0.0, target], jnp.float32)
        return jnp.sum(jnp.abs(logits - targets[None, None, :]))
