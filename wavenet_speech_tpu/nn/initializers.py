"""Parameter initializers matching the reference's torch init conventions.

The reference initializes (see /root/reference/modules/wavenet.py:73-85,
raw_ctcnet.py:90-114):
  * conv / linear weights: kaiming-uniform (torch default a=0, fan_in,
    leaky_relu gain -> bound = sqrt(6 / fan_in))
  * biases: zeros (WaveNet/Classifier) or zeros + eps*N(0,1) (RawCTCNet)
  * skip "bottleneck" 1x1 convs: identity (eye) init, optionally + eps noise.

Weight shape conventions here (NLC / lax.conv_general_dilated with
dimension_numbers ("NWC","WIO","NWC")): conv kernels are (K, C_in, C_out);
linear/dense kernels are (C_in, C_out).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ with default args (a=0, fan_in,
    leaky_relu): U(-b, b) with b = sqrt(6 / fan_in).

    fan_in for a (K, C_in, C_out) conv kernel is K * C_in; for a
    (C_in, C_out) dense kernel it is C_in.
    """
    if len(shape) == 3:  # (K, C_in, C_out) conv kernel
        fan_in = shape[0] * shape[1]
    elif len(shape) == 2:  # (C_in, C_out) dense kernel
        fan_in = shape[0]
    else:
        fan_in = int(np.prod(shape[:-1]))
    bound = float(np.sqrt(6.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_normal(key, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_ default: N(0, sqrt(2 / fan_in))."""
    if len(shape) == 3:
        fan_in = shape[0] * shape[1]
    elif len(shape) == 2:
        fan_in = shape[0]
    else:
        fan_in = int(np.prod(shape[:-1]))
    std = float(np.sqrt(2.0 / fan_in))
    return std * jax.random.normal(key, shape, dtype)


def eye(key, shape, dtype=jnp.float32):
    """Identity init for 1x1 conv kernels (K=1, C_in, C_out) or dense
    (C_in, C_out) kernels; rectangular identity for non-square.

    Mirrors nn_init.eye on the (out,in) 2-D view (reference wavenet.py:83)."""
    del key
    if len(shape) == 3:
        k, cin, cout = shape
        assert k == 1, "eye init only valid for 1x1 convs"
        return jnp.eye(cin, cout, dtype=dtype)[None, :, :]
    cin, cout = shape
    return jnp.eye(cin, cout, dtype=dtype)


def zeros(key, shape, dtype=jnp.float32):
    del key
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    del key
    return jnp.ones(shape, dtype)


def with_noise(base_init, eps: float):
    """Wrap an initializer to add eps * N(0,1), as in the RawCTCNet init
    scheme (reference raw_ctcnet.py:92-114: eye/zero + 1e-4 noise)."""

    def init(key, shape, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        return base_init(k1, shape, dtype) + eps * jax.random.normal(k2, shape, dtype)

    return init
