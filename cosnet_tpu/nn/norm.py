"""BatchNorm with exact torch semantics (flax's differs in one detail).

torch ``nn.BatchNorm2d`` (train mode) normalizes with the *biased* batch
variance but updates ``running_var`` with the *unbiased* one (×n/(n−1));
``flax.linen.BatchNorm`` updates with the biased variance. The reference's
train→eval parity depends on the torch rule, so it is replicated here.
Stat updates compound across the two siamese encoder calls per step, exactly
like torch (verified in tests/test_model_parity.py).
"""
import flax.linen as nn
import jax.numpy as jnp
from jax import lax


class BatchNorm(nn.Module):
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((features,), jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)  # biased, for normalization
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / (n - 1)) if n > 1 else var
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        y = (x.astype(jnp.float32) - mean) * lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.dtype)
