"""Double-buffered host→device prefetch.

The reference overlaps disk/decode with training via a producer thread and a
bounded queue (reference: data_loading/image_data_loader.py:20-24,88-117) but
still pays a synchronous host→device copy per step (cp.asarray at
examples/imagenet_dogs_225_resnet_18_depsep.py:218-221). On TPU the transfer is
the dominant per-step host cost (tens to hundreds of ms through the host link),
so we additionally pipeline the device_put: batches are dispatched to the device
``size`` steps ahead while the current step computes — jax transfers are async,
so this costs nothing on the host."""

import collections
import itertools

import numpy as np
import jax
import jax.numpy as jnp


def device_prefetch(iterator, size=2, sharding=None):
    """Wrap an iterator of (X, y, one_hot) host batches (or any pytrees of
    numpy arrays); yields the same structures as device-resident jax.Arrays,
    keeping ``size`` batches in flight."""

    def put(x):
        if isinstance(x, np.ndarray) and x.dtype == np.float64:
            x = x.astype(np.float32)
        if isinstance(x, (np.ndarray, np.generic)):
            return jax.device_put(x, sharding)
        return x  # non-array elements (e.g. label lists) pass through

    buf = collections.deque()
    for batch in iterator:
        buf.append(jax.tree_util.tree_map(put, batch))
        if len(buf) >= size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def stack_batches(iterator, k):
    """Group ``k`` consecutive loader batches into stacked arrays for the
    one-dispatch-per-K-steps trainers: an iterator of (X, y, one_hot) tuples
    becomes an iterator of (X_stack (k, ...), y_stack, one_hot_stack).

    Pairs with ``Trainer.multi_step`` / ``multi_step_augmented`` (and
    composes with device_prefetch on either side). A final group with fewer
    than k batches is DROPPED — a ragged stack would compile a second scan
    program for one use; run the tail through ``step``/``step_augmented``
    yourself if those images matter."""
    def stack(parts):
        if isinstance(parts[0], jax.Array):
            return jnp.stack(parts)  # device-side stack: batches coming out
            # of device_prefetch stay on device (fetching them back through
            # the host link would defeat the prefetch)
        if isinstance(parts[0], (np.ndarray, np.generic)):
            return np.stack(parts)
        return list(parts)  # non-arrays (e.g. None labels) pass through

    it = iter(iterator)
    while True:
        group = list(itertools.islice(it, k))
        if len(group) < k:
            return
        yield tuple(stack(parts) for parts in zip(*group))
