"""Device mesh and sharding layout for pod-scale batch generation.

The reference is single-process single-GPU with batch size hard-locked to 1
(reference config.py:21, sample.py:246-251); multiple images are generated
*serially* (sample.py:278).  Parallelism here is new first-class design
surface (SURVEY.md §2, "Parallelism & distributed communication"):

* a 2-D `(prompt, seed)` mesh — the pod-serving layout of BASELINE config 5
  (8 prompts x 4 seeds/chip).  The generation batch axis is sharded over
  both mesh axes; model parameters are replicated.  The guided hot loop is
  batch-elementwise, so XLA inserts **zero collectives** — per-step work
  rides each chip's MXU, ICI stays idle for progress outfeed.
* per-element RNG uses JAX's counter-based PRNG keyed by (base key, step,
  batch index), so results are bitwise identical regardless of how many
  chips the batch spans — verified by tests/test_sharding.py exactly as
  SURVEY.md §4 prescribes.
* multi-host: `jax.distributed.initialize` + the same code; the mesh simply
  spans all processes' devices (XLA collectives over ICI/DCN when a future
  cross-chip loss term needs them).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("prompt", "seed"),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first `n_devices` devices.

    Default factorization puts the longer factor on the first axis, e.g.
    8 chips -> (4 prompts, 2 seeds)."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        else:
            a = int(np.floor(np.sqrt(n)))
            while n % a:
                a -= 1
            shape = (max(n // a, a), min(n // a, a))
    mesh_devices = np.asarray(devices).reshape(tuple(shape))
    return Mesh(mesh_devices, tuple(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a leading batch axis across ALL mesh axes (prompt-major)."""
    return NamedSharding(mesh, P(mesh.axis_names))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_collective_free(tree, mesh: Mesh):
    """Replicate a pytree onto every device of `mesh` WITHOUT any XLA
    collective: each leaf is assembled from per-device host→device copies
    via `make_array_from_single_device_arrays`.

    Both jit's implicit replication of an uncommitted input and an
    explicit `device_put(x, replicate(mesh))` of a device-resident array
    lower to an all-reduce broadcast whose rendezvous has a hard ~40 s
    termination timeout.  On a 1-core host emulating N CPU devices (the
    driver's fake-mesh dryrun) a straggler device thread can miss that
    window while another device's compute thunks monopolize the core, and
    the runtime aborts the process (observed: the flagship dryrun's
    uncommitted PRNG key — rendezvous.cc abort through AllReduceThunk
    while the 552M UNet step ran).  Per-device copies sidestep XLA's
    collective path entirely, so correctness never depends on host speed.
    On real multi-chip hardware this costs N host transfers — fine for
    small operands; for big trees already on device prefer
    `jax.device_put(tree, replicate(mesh))`, which rides ICI."""
    rep = replicate(mesh)
    devices = list(mesh.devices.flat)

    def _rep(leaf):
        leaf = np.asarray(leaf)
        shards = [jax.device_put(leaf, d) for d in devices]
        return jax.make_array_from_single_device_arrays(
            leaf.shape, rep, shards
        )

    return jax.tree_util.tree_map(_rep, tree)


def shard_pipeline_inputs(mesh: Mesh, x, params_tree):
    """Place the generation batch on the mesh and replicate parameters."""
    x = jax.device_put(x, batch_sharding(mesh))
    params_tree = jax.device_put(params_tree, replicate(mesh))
    return x, params_tree
