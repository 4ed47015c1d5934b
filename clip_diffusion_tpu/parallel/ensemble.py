"""Ensemble-sharded (perceptor-parallel) guidance.

The reference evaluates its 4-CLIP ensemble serially on one GPU (reference
sample.py:161-214).  On a TPU slice the ensemble admits model parallelism
(SURVEY.md §2 "CLIP ensemble guidance additionally admits model-parallel
evaluation — one perceptor per chip, psum of guidance gradients"): each
device along an `ensemble` mesh axis runs the full UNet forward (replicated,
~15% of the step) plus ONE perceptor's cutout+CLIP+loss gradient (~85% of
the step, split N ways), and a single `psum` over ICI combines the guidance
gradients — cutting per-image step latency ~Nx on the guidance path.

Because the perceptors are architecturally heterogeneous (ViT-B/32 ≠ RN101),
SPMD cannot shard them as a stacked axis; instead every device compiles all
perceptor branches and `lax.switch`es on its `axis_index` — one branch
executes per device.  Whole-image loss terms (TV/range/LPIPS/MS-SSIM) are
counted once, on axis position 0.

RNG parity: cutout keys fold in the GLOBAL perceptor index, so the psum'd
gradient equals the single-device run with
`share_cutouts_across_perceptors=False` bit-for-bit up to reduction order.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from clip_diffusion_tpu.diffusion.sampling import schedule_tables_np
from clip_diffusion_tpu.pipeline.guided import (
    GuidedPipeline,
    _clamp_guidance_grad,
    apply_sampler_update,
    make_guidance_loss,
)


def build_ensemble_guided_step(
    pipe: GuidedPipeline,
    mesh: Mesh,
    axis: str = "ensemble",
    slot_caps: Optional[Tuple[int, int]] = None,
):
    """Step function with the guidance ensemble sharded over `mesh[axis]`.

    Requires len(pipe.perceptors) == mesh.shape[axis] (one perceptor per
    device along the axis; other mesh axes may carry data parallelism —
    inputs are taken replicated along `axis`).

    Returns step_fn(params, carry, step, base_key) -> (carry, pred_x0) whose
    outputs are replicated along `axis` (call under jit; shard_map inside).
    """
    n = mesh.shape[axis]
    n_perc = len(pipe.perceptors)
    if n != n_perc:
        raise ValueError(
            f"ensemble axis has {n} devices but the pipeline has {n_perc} "
            "perceptors (one per device required)"
        )
    tables_np = schedule_tables_np(pipe.schedule)
    sched_arrays = pipe.config.cutout_schedules.as_arrays()
    # one loss per perceptor; image-wide terms ride branch 0 only
    branch_losses = [
        make_guidance_loss(
            pipe, tables_np, sched_arrays, slot_caps,
            perceptor_subset=(i,), include_image_terms=(i == 0),
        )
        for i in range(n_perc)
    ]
    # jax.grad, not value_and_grad: the loss value is unused and dropping
    # it DCEs its cross-batch reduction (see pipeline/guided.py)
    branch_grads = [
        jax.grad(f, has_aux=True) for f in branch_losses
    ]
    sampler = pipe.sampler

    def sharded_step(params, x, eps_hist, hist_count, step, base_key):
        tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
        key = jax.random.fold_in(base_key, step)
        k_cut, k_noise = jax.random.split(key)
        idx = jax.lax.axis_index(axis)

        grad, aux = jax.lax.switch(
            idx, branch_grads, x, params, step, k_cut
        )
        _, _, pred_x0_raw = aux
        grad = jax.lax.psum(grad, axis)
        guidance = _clamp_guidance_grad(-grad, pipe.config.grad_threshold)
        # pred_x0_raw comes from the replicated UNet forward: identical on
        # every device, as are thresholding and the conditioned update
        return apply_sampler_update(
            sampler, tables, (x, eps_hist, hist_count), step, pred_x0_raw,
            guidance, k_noise,
        )

    from jax import shard_map

    # everything replicated along the ensemble axis; other mesh axes pass
    # through untouched (callers shard the batch axis upstream if desired)
    spec = P()
    inner = shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=((spec, spec, spec), spec),
        check_vma=False,  # per-device RNG differs; outputs are psum-combined
    )

    def step_fn(params, carry, step, base_key):
        x, eps_hist, hist_count = carry
        return inner(params, x, eps_hist, hist_count, jnp.asarray(step),
                     jnp.asarray(base_key))

    return step_fn


def ensemble_mesh(n: Optional[int] = None, axis: str = "ensemble") -> Mesh:
    """1-D mesh over the first n devices for perceptor parallelism."""
    devices = jax.devices()[: n or len(jax.devices())]
    return Mesh(np.asarray(devices), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
