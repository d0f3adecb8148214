"""Weight initializers matching the reference's (torch-default) init scheme.

The reference never overrides conv inits (its ``initialize_weights``,
reference utils/torch_utils.py:149-161, only tweaks BN eps/momentum), so
every conv uses torch's Conv2d default: kaiming_uniform(a=sqrt(5)) which
reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias.
Matching it keeps training dynamics comparable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(+-1/sqrt(fan_in)) for HWIO kernels; fan_in = kh*kw*cin_per_group."""
    kh, kw, cin, _ = shape
    bound = 1.0 / (kh * kw * cin) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_bias_init_for(fan_in: int):
    bound = 1.0 / fan_in ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def implicit_init(mean: float, std: float = 0.02):
    """YOLOR implicit knowledge init: N(mean, std) (reference models/common.py:445-468)."""

    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init
