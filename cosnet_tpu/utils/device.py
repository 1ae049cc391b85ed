"""Device-residency helpers.

On the tunneled-TPU ("axon") platform, arrays created from host memory
(``jnp.asarray`` of numpy) remain host-backed and are **re-uploaded on every
executable launch** — a 560 MB weight tree adds ~5.5 s per forward call.
Running the tree through a jitted identity materializes true device buffers
(outputs of an execution live on the device), after which the same forward
runs in tens of milliseconds. Measured on v5e: 5562 ms → 47 ms per call.

Harmless on normal backends (one extra copy at startup).
"""
import jax
import jax.numpy as jnp


@jax.jit
def _identity(tree):
    # `+ 0` (dtype-preserving) rather than a bare identity: XLA would alias
    # a no-op's outputs to its (host-backed) inputs and skip the copy.
    return jax.tree.map(lambda a: a + jnp.zeros((), a.dtype), tree)


def device_materialize(tree):
    """Return a copy of ``tree`` whose leaves are device-resident buffers."""
    out = _identity(tree)
    jax.block_until_ready(out)
    return out
