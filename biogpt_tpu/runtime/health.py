"""Failure detection for the serving runtime and the artifact chain.

The reference has no failure detection at all (SURVEY §5: errors are
``false``/``fprintf`` returns, /root/reference/biogpt.cpp:35-48,394-417;
nothing watches a running generation). On a TPU serving deployment the
two failure modes that actually bite are silent numerics (a corrupt
checkpoint or a kernel bug turns logits into NaN/Inf and the sampler
keeps emitting *some* token id — garbage text, no crash) and a hung
device (a wedged dispatch leaves every client waiting forever). Both are
detected here:

- ``ModelHealthError`` — raised by :class:`~.serving.BatchedEngine` when a
  decode chunk's logits contain non-finite values on any live slot. The
  check is folded into the decode scan ON DEVICE (one ``isfinite`` reduce
  per step, ~2 µs against a ~0.5 ms step) and rides home with the regular
  token drain, so detection costs no extra host↔device traffic.
- ``DrainStallError`` — raised when launched chunks stop draining for
  ``watchdog_s`` seconds (hung device / dead relay), with the launched vs
  drained counters in the message.
- ``check_params_finite`` — walks a loaded parameter pytree and raises on
  any non-finite float leaf (corrupt ``ggml-model.bin`` sections decode
  to NaN scales long before they produce wrong text).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class ModelHealthError(RuntimeError):
    """Non-finite logits were produced for a live request slot."""


class DrainStallError(RuntimeError):
    """Launched decode chunks stopped draining within the watchdog."""


def _float_leaves(params):
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if (isinstance(leaf, (jax.Array, np.ndarray))
                and jnp.issubdtype(leaf.dtype, jnp.floating)):
            yield path, leaf


def check_params_finite(params, name: str = "params") -> None:
    """Raise ``ModelHealthError`` naming every non-finite float leaf.

    Quantized tensors store their scales/mins as float planes inside the
    pytree, so a corrupt quantized checkpoint is caught the same way as a
    corrupt f32 one. Integer planes are skipped (always finite).

    Two-phase on purpose: a device->host fetch costs ~35 ms on this
    runtime, so the healthy path is ONE fused tree-wide reduction and one
    fetch; only a failure pays the per-leaf walk to name the culprits.
    """
    leaves = [leaf for _, leaf in _float_leaves(params)]
    if not leaves:
        return
    ok = jax.jit(lambda ls: jnp.array(
        [jnp.isfinite(x).all() for x in ls]).all())(leaves)
    if bool(ok):
        return
    bad = [jax.tree_util.keystr(path)
           for path, leaf in _float_leaves(params)
           if not bool(jnp.isfinite(leaf).all())]
    raise ModelHealthError(
        f"non-finite values in {name}: {', '.join(sorted(bad))}")
