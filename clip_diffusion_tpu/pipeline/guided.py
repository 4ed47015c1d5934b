"""The CLIP-guided diffusion pipeline, fused into one `lax.scan`.

This is the TPU redesign of the reference's hot loop (reference
sample.py:59-314, call stack in SURVEY.md §3.1).  Per timestep the reference
runs: UNet forward (inside the sampler), a *second* UNet forward inside
cond_fn's `p_mean_variance`, 4 CLIP models x 4 cutout batches of CLIP
fwd+bwd, and one UNet VJP — all as eager torch ops from Python.

Here the whole per-timestep body is a single XLA program inside `lax.scan`:

* ONE UNet forward shared between the sampler update and the guidance loss
  (the reference's two forwards at the same (x, t) are mathematically one;
  its cond_fn just couldn't share autograd state).  The guidance gradient
  comes from `jax.value_and_grad` of the scalar loss w.r.t. x through that
  shared forward — replacing the manual double `autograd.grad` VJP chain
  (reference sample.py:199-231).  Net: 1 fwd + 1 bwd per step instead of
  2 fwd + 1 bwd.
* cutout counts/sizes ride dense schedule tables gathered by timestep
  (reference sample.py:156-172), so all schedule phases share one compiled
  program.
* all `num_cutout_batches` cutout groups for all scheduled cuts are embedded
  in ONE batched CLIP forward per perceptor (the reference's sequential
  batches average gradients arithmetically — identical math, reference
  sample.py:162,206,213 — but 4x better MXU utilization).
* NaN guard and RMS gradient clamp keep the reference's fault-tolerance
  semantics (reference sample.py:228-238).
* dynamic thresholding is applied as the sampler's denoised_fn on the
  sampler path only — the guidance loss sees the raw mixed prediction,
  exactly like the reference (its cond_fn calls p_mean_variance *without*
  denoised_fn; sample.py:149-154 vs 116-132).

Parameter flow (IMPORTANT): all model parameters travel through the jit
boundary as a `GuidedParams` pytree ARGUMENT — never as Python closures.
Closed-over weights get serialized into the HLO as constants (a ~2 GB
program for the 552M UNet), which breaks ahead-of-time/remote compilation
and bloats every cache entry.  `GuidedPipeline` itself holds only pure
functions and static metadata.

Batching: images are NHWC with a leading batch of independent seeds/prompts
(the reference is locked to batch 1 and generates `num_batches` serially,
sample.py:246-251,278; here the batch axis is first-class and shards across
chips, see parallel/).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import io_callback

from clip_diffusion_tpu.config import Config
from clip_diffusion_tpu.diffusion.sampling import (
    SamplerConfig,
    condition_eps,
    ddim_step,
    dynamic_threshold,
    init_history,
    plms_eps,
    plms_step,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    push_history,
    q_sample,
    schedule_tables,
    schedule_tables_np,
)
from clip_diffusion_tpu.diffusion.schedule import NoiseSchedule
from clip_diffusion_tpu.guidance.cutouts import CutoutSpec, make_cutouts_batch
from clip_diffusion_tpu.guidance.losses import (
    l2_normalize,
    rgb_range_loss,
    square_spherical_distance_loss,
    structural_dissimilarity_loss,
    total_variational_loss,
)
from clip_diffusion_tpu.models.clip.model import clip_normalize
from clip_diffusion_tpu.models.unet import split_model_output


class DeadlineExceeded(Exception):
    """Raised by guided_sample when a host-side `deadline` expires between
    dispatch chunks.  The partially filled `chunk_times` list remains valid:
    bench.py reconstructs a labeled steady-state estimate from whatever
    chunks completed (VERDICT r4 item 1 — a labeled estimate beats a killed
    process with no output).  Checked only BETWEEN chunks: a single cold
    remote compile (~4-6 min) inside one chunk cannot be interrupted."""


@dataclasses.dataclass(frozen=True)
class Perceptor:
    """One CLIP model wired for guidance.  Pure functions only — the
    parameters live in GuidedParams.perceptors[i]."""

    name: str
    embed_image: Callable  # (clip_params, CLIP-normalized (N,S,S,3)) -> (N,D)
    input_resolution: int
    aesthetic_fn: Optional[Callable] = None  # (aes_params, (N,D)) -> (N,1)


class GuidedParams(Dict[str, Any]):
    """Parameter/data pytree passed through jit as an argument:

    {
      "unet": <unet params>,
      "perceptors": [
         {"clip": <params>, "aesthetic": <params or ()>,
          "text_embeddings": (P,D), "text_weights": (P,)},
         ...
      ],
      "init_image": (1,H,W,3) or (),   # [-1,1] init/LPIPS target
    }
    """


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash (lru keys)
class GuidedPipeline:
    """Static pipeline description: pure apply functions + config.  Safe to
    close over in jit (contains no arrays)."""

    unet_apply: Callable  # (unet_params, x NHWC, t (B,)) -> (B,H,W,2C)
    perceptors: Tuple[Perceptor, ...]
    config: Config
    sampler: SamplerConfig
    schedule: NoiseSchedule
    lpips_fn: Optional[Callable] = None  # (lpips_params, x, y) -> (B,)
    use_init_losses: bool = False  # LPIPS/MS-SSIM terms active

    def cutout_spec(self, resolution: int,
                    slot_caps: Optional[Tuple[int, int]] = None) -> CutoutSpec:
        cs = self.config.cutout_schedules
        max_ov, max_in = slot_caps or (cs.max_overview_cuts, cs.max_inner_cuts)
        return CutoutSpec(
            cut_size=resolution,
            max_overview=max_ov,
            max_inner=max_in,
        )


def _chunked_embed(embed_fn, clip_params, cuts, chunk: int):
    """Embed a (B, N, S, S, 3) cut batch as (B, N, D), in sequential
    chunks of at most `chunk` cuts along the CUT axis.

    Per-cut math is bit-identical to the monolithic call (concatenated
    embeddings; concat's VJP slices the gradient back per chunk) — the
    only change is XLA's schedule: the fwd+bwd tower pass is superlinear
    in batch on v5e (backward-residual working set; L/14 3.40 -> 3.99
    ms/cut from 24 -> 64 cuts, measured round 5) and chunking keeps each
    chunk's residuals hot (64-cut L/14 255.5 -> 198.4 ms at chunk=16,
    B/16 -> 39.2 ms; whole-step wins in STATUS.md round-5 table).

    Chunking slices axis 1 (cuts), never axis 0: the pod layouts shard
    the image batch over the mesh, and a slice through a flattened
    (B*N) axis would cross device boundaries and insert collectives
    (tests/test_sharding.py pins the pod step at zero collectives)."""
    b, n = cuts.shape[0], cuts.shape[1]
    tail = cuts.shape[2:]

    def flat_embed(c):
        e = embed_fn(clip_params, c.reshape((-1,) + tail))
        return e.reshape(b, c.shape[1], -1)

    if chunk <= 0 or n <= chunk:
        return flat_embed(cuts)
    return jnp.concatenate(
        [flat_embed(cuts[:, i:i + chunk]) for i in range(0, n, chunk)],
        axis=1,
    )


def _schedule_index(tables, step):
    """Respaced step -> dense 1000-basis schedule index: the reference's
    `1000 - (t+1)` with t the rescaled timestep (sample.py:156-159)."""
    t_scaled = tables["scaled_timesteps"][step]
    return jnp.clip(999 - jnp.floor(t_scaled).astype(jnp.int32), 0, 999)


def make_guidance_loss(pipe: GuidedPipeline, tables, sched_arrays,
                       slot_caps: Optional[Tuple[int, int]] = None,
                       perceptor_subset: Optional[Tuple[int, ...]] = None,
                       include_image_terms: bool = True):
    """Build loss(params, x, step, key) -> (scalar, aux), differentiated
    w.r.t. x.  The scalar sums per-image losses (batch elements are
    independent, so d(sum)/dx gives each image its own gradient).

    `slot_caps`: optional (max_overview, max_inner) override — used by the
    phase-segmented runner to compile exact-sized cutout batches with zero
    padded slots.

    `perceptor_subset`: restrict the CLIP ensemble to these perceptor
    indices (parallel/ensemble.py shards the ensemble over a mesh axis and
    psums the guidance gradients); cutout RNG folds in the PERCEPTOR index
    so a subset's cutouts are identical to the non-shared single-device
    run's.  `include_image_terms=False` drops the whole-image TV/range/
    init-image terms (they must be counted once across the ensemble axis,
    not once per device)."""
    cfg = pipe.config
    # closures hold NUMPY tables; device constants are materialized inside
    # the traced function.  The built loss_fn is cached across independent
    # jit traces (lru-cached runners), and jnp constants created during one
    # outer trace would leak as stale tracers into the next.
    tables_np = {k: np.asarray(v) for k, v in tables.items()}  # numpy in, numpy kept
    sched_np = tuple(np.asarray(a) for a in sched_arrays)

    def loss_fn(x, params, step, key):
        tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
        n_ov_table, n_in_table, power_table, gray_table = (
            jnp.asarray(a) for a in sched_np
        )
        b = x.shape[0]
        t_scaled = jnp.broadcast_to(tables["scaled_timesteps"][step], (b,))
        model_out = pipe.unet_apply(params["unet"], x, t_scaled)
        eps, var_raw = split_model_output(model_out)
        pred_x0 = predict_xstart_from_eps(x, eps, tables, step)

        # mixed denoised prediction (reference sample.py:152-154)
        factor = tables["sqrt_one_minus_alphas_cumprod"][step].astype(x.dtype)
        denoised = pred_x0 * factor + x * (1.0 - factor)

        idx = _schedule_index(tables, step)
        n_ov = n_ov_table[idx]
        n_in = n_in_table[idx]
        power = power_table[idx]
        gray = gray_table[idx]

        total = jnp.float32(0.0)
        if cfg.clip_guidance_scale > 0:
            if perceptor_subset is not None:
                # ensemble-sharded: one group per perceptor, keyed by its
                # GLOBAL index (RNG parity with the non-shared full run)
                groups = [
                    (pipe.perceptors[pi].input_resolution, [pi])
                    for pi in perceptor_subset
                ]
                group_keys = list(perceptor_subset)
            # group perceptors that can share one cutout batch (see
            # Config.share_cutouts_across_perceptors)
            elif cfg.share_cutouts_across_perceptors:
                groups_d: Dict[int, list] = {}
                for pi, perc in enumerate(pipe.perceptors):
                    groups_d.setdefault(perc.input_resolution, []).append(pi)
                groups = list(groups_d.items())
                group_keys = list(range(len(groups)))
            else:
                groups = [
                    (perc.input_resolution, [pi])
                    for pi, perc in enumerate(pipe.perceptors)
                ]
                group_keys = list(range(len(groups)))
            gdtype = jnp.dtype(cfg.guidance_dtype)
            for gi, (resolution, members) in zip(group_keys, groups):
                gkey = jax.random.fold_in(key, gi)
                spec = pipe.cutout_spec(resolution, slot_caps)
                cuts, w = make_cutouts_batch(
                    denoised.astype(gdtype), gkey, n_ov, n_in, power,
                    gray, spec, repeats=cfg.num_cutout_batches,
                )  # (B, N, S, S, 3), (B, N)
                n = cuts.shape[1]
                cuts_normed = clip_normalize(cuts)  # (B, N, S, S, 3)
                for pi in members:
                    perc = pipe.perceptors[pi]
                    pp = params["perceptors"][pi]
                    embs = _chunked_embed(
                        perc.embed_image, pp["clip"], cuts_normed,
                        cfg.clip_cut_chunk,
                    )  # (B, N, D); chunked along cuts — see _chunked_embed
                    # (B, N, P) spherical distances vs weighted prompts.
                    # text_embeddings (P, D): one prompt set shared by the
                    # whole batch; (B, P, D): heterogeneous per-image
                    # prompts (pod serving), padded terms carry zero weight.
                    te, tw = pp["text_embeddings"], pp["text_weights"]
                    if te.ndim == 3:
                        d = square_spherical_distance_loss(
                            embs[:, :, None, :], te[:, None, :, :]
                        )
                        weighted = jnp.sum(d * tw[:, None, :], axis=-1)
                    else:
                        d = square_spherical_distance_loss(
                            embs[:, :, None, :], te[None, None, :, :]
                        )
                        weighted = jnp.sum(d * tw[None, None, :], axis=-1)
                    total += cfg.clip_guidance_scale * jnp.sum(w * weighted)
                    if perc.aesthetic_fn is not None and cfg.aesthetic_scale > 0:
                        scores = perc.aesthetic_fn(
                            pp["aesthetic"], l2_normalize(embs, axis=-1)
                        )[..., 0]
                        total -= cfg.aesthetic_scale * jnp.sum(w * scores)

        if include_image_terms and cfg.denoise_scale > 0:
            total += cfg.denoise_scale * jnp.sum(total_variational_loss(denoised))
        if include_image_terms and cfg.range_scale > 0:
            total += cfg.range_scale * jnp.sum(rgb_range_loss(denoised))
        if include_image_terms and pipe.use_init_losses:
            init_image = params["init_image"]
            if pipe.lpips_fn is not None and cfg.LPIPS_scale > 0:
                total += cfg.LPIPS_scale * jnp.sum(
                    pipe.lpips_fn(params.get("lpips", ()), denoised, init_image)
                )
            if cfg.MS_SSIM_scale > 0:
                total += cfg.MS_SSIM_scale * jnp.sum(
                    structural_dissimilarity_loss(denoised, init_image)
                )
        return total, (eps, var_raw, pred_x0)

    return loss_fn


def _clamp_guidance_grad(grad, threshold):
    """Reference sample.py:228-238: zero the gradient if any NaN (per batch
    element), then clamp its RMS magnitude to `threshold`."""
    finite = jnp.all(jnp.isfinite(grad), axis=(1, 2, 3), keepdims=True)
    grad = jnp.where(finite, grad, 0.0)
    mag = jnp.sqrt(jnp.mean(grad**2, axis=(1, 2, 3), keepdims=True))
    return grad * jnp.clip(mag, None, threshold) / jnp.maximum(mag, 1e-12)


def build_guided_step(pipe: GuidedPipeline,
                      slot_caps: Optional[Tuple[int, int]] = None):
    """Build the scan body: (params, carry, step_index, base_key) ->
    (carry, pred_x0).

    carry = (x, eps_history, history_count); RNG is derived per step from a
    base key folded with the step index (independent of scan order)."""
    # numpy in the closure, device constants inside the trace (see
    # make_guidance_loss: cached runners must not pin one trace's constants)
    tables_np = schedule_tables_np(pipe.schedule)
    loss_fn = make_guidance_loss(
        pipe, tables_np, pipe.config.cutout_schedules.as_arrays(), slot_caps
    )
    # jax.grad, NOT value_and_grad: the loss VALUE is unused by the step,
    # and dropping it lets XLA DCE the cross-device sum of per-image
    # losses — the batch-sharded hot loop then carries ZERO collectives
    # (the all-reduce also trips CPU-collective rendezvous timeouts on
    # contended virtual-device dryruns)
    grad_fn = jax.grad(loss_fn, has_aux=True)
    sampler = pipe.sampler

    def step_fn(params, carry, step, base_key):
        tables = {k: jnp.asarray(v) for k, v in tables_np.items()}
        x, eps_hist, hist_count = carry
        key = jax.random.fold_in(base_key, step)
        k_cut, k_noise = jax.random.split(key)

        grad, (eps, var_raw, pred_x0_raw) = grad_fn(
            x, params, step, k_cut
        )
        guidance = _clamp_guidance_grad(-grad, pipe.config.grad_threshold)
        return apply_sampler_update(
            sampler, tables, (x, eps_hist, hist_count), step, pred_x0_raw,
            guidance, k_noise,
        )

    return step_fn, tables_np


def apply_sampler_update(sampler, tables, carry, step, pred_x0_raw, guidance,
                         k_noise):
    """Post-guidance sampler update: threshold pred_x0, re-derive eps,
    condition on the guidance gradient (guided-diffusion condition_score
    order), then the DDIM or PLMS step."""
    x, eps_hist, hist_count = carry
    if sampler.thresholding_method == "histogram":
        from clip_diffusion_tpu.ops.quantile import dynamic_threshold_fast

        pred_x0_thr = dynamic_threshold_fast(
            pred_x0_raw, sampler.dynamic_thresholding_percentile
        )
    else:
        pred_x0_thr = dynamic_threshold(
            pred_x0_raw, sampler.dynamic_thresholding_percentile
        )
    eps_thr = predict_eps_from_xstart(x, pred_x0_thr, tables, step)
    eps_cond = condition_eps(eps_thr, guidance, tables, step)
    pred_x0_final = predict_xstart_from_eps(x, eps_cond, tables, step)

    if sampler.mode == "plms":
        eps_prime = plms_eps(eps_cond, eps_hist, hist_count, sampler.order)
        x_next = plms_step(x, eps_prime, tables, step)
        eps_hist = push_history(eps_cond, eps_hist)
        hist_count = hist_count + 1
    else:
        noise = jax.random.normal(k_noise, x.shape, x.dtype)
        x_next = ddim_step(
            x, eps_cond, pred_x0_final, tables, step, sampler.eta, noise
        )
    return (x_next, eps_hist, hist_count), pred_x0_final


def guided_sample(
    pipe: GuidedPipeline,
    params: Dict[str, Any],
    key,
    batch_size: int = 1,
    init_image: Optional[jnp.ndarray] = None,
    num_frames: int = 6,
    progress_callback: Optional[Callable] = None,
    progress_every: int = 5,
    max_steps_per_dispatch: int = 50,
    resume_state=None,
    return_state: bool = False,
    stop_after: Optional[int] = None,
    chunk_times: Optional[list] = None,
    deadline: Optional[float] = None,
):
    """Run the full guided trajectory.

    `max_steps_per_dispatch`: trajectories execute as host-chained scan
    chunks of at most this many steps — long single dispatches can exceed
    execution deadlines on remote-attached TPUs, and chunking costs only
    one host round-trip per chunk.

    Preemption-safe resume: pass a `utils.checkpoint.SamplingState` as
    `resume_state` to continue a trajectory bit-exactly (per-step RNG is
    fold_in(key, step), so completed steps never replay);
    `return_state=True` additionally returns the final SamplingState.

    Returns (final_images, frames): final pred_xstart in [-1,1] NHWC and
    `num_frames` evenly spaced trajectory frames (the reference's GIF
    source, image_utils.py:45-73).

    `progress_callback(step_index, image_batch)` — optional host hook fired
    every `progress_every` steps via io_callback (the reference uploads the
    current image every 5 steps, sample.py:297-303).

    `chunk_times` (phase-segmented only): pass a list to receive
    `(slot_caps, n_steps, seconds)` per dispatched chunk, with a forced
    per-chunk sync — bench.py uses this to separate warm steady-state
    execution from one-time executable-load cost within a single
    trajectory.

    `deadline` (phase-segmented only): host wall-clock `time.time()` value;
    when it passes between chunks, raises DeadlineExceeded (chunk_times
    keeps what completed)."""
    cfg = pipe.config
    sampler = pipe.sampler
    shape = (batch_size, cfg.height, cfg.width, 3)

    # resume RNG contract: the state carries the trajectory's base key, so
    # a new process can resume with key=None; an explicit key must MATCH
    # (per-step RNG is fold_in of this key — a silent mismatch would resume
    # a different trajectory)
    from clip_diffusion_tpu.utils.checkpoint import key_data as _key_data

    if resume_state is not None:
        saved = np.asarray(resume_state.key_data, np.uint32)
        if key is None:
            key = jnp.asarray(saved)
        elif not np.array_equal(_key_data(key), saved):
            raise ValueError(
                "resume_state was checkpointed under a different PRNG key; "
                "pass key=None to resume with the saved key"
            )
    elif key is None:
        raise ValueError("guided_sample: key is required unless resuming")

    start = pipe.schedule.num_steps - sampler.skip_timesteps - 1
    n_steps = int(start) + 1

    tables = schedule_tables(pipe.schedule)
    k_init, k_scan = jax.random.split(key)
    if init_image is not None:
        init_image = jnp.asarray(init_image, jnp.float32)
        params = dict(params)
        params["init_image"] = init_image
        noise = jax.random.normal(k_init, shape, jnp.float32)
        x = q_sample(
            jnp.broadcast_to(init_image, shape), tables, jnp.int32(start), noise
        ).astype(jnp.float32)
    else:
        x = jax.random.normal(k_init, shape, jnp.float32)

    if sampler.phase_segmented:
        runner = _get_segmented_runner(
            pipe, n_steps, num_frames, progress_callback, progress_every,
            max_steps_per_dispatch,
        )
    else:
        runner = _get_runner(
            pipe, n_steps, num_frames, progress_callback, progress_every,
            max_steps_per_dispatch,
        )

    inner0 = None
    start_pos = 0
    if resume_state is not None:
        inner0 = (
            jnp.asarray(resume_state.x, jnp.float32),
            jnp.asarray(resume_state.eps_history, jnp.float32),
            jnp.int32(resume_state.history_count),
        )
        # resume_state.step = next step to execute (counts down)
        start_pos = start - int(resume_state.step)

    end_pos = None if stop_after is None else start_pos + stop_after
    if sampler.phase_segmented and (chunk_times is not None
                                    or deadline is not None):
        frames, inner = runner(params, x, k_scan, inner0, start_pos, end_pos,
                               chunk_times=chunk_times, deadline=deadline)
    else:
        if deadline is not None:
            raise ValueError("deadline requires phase_segmented sampling")
        frames, inner = runner(params, x, k_scan, inner0, start_pos, end_pos)
    final_x = frames[-1]  # pred_x0 at the last step
    if return_state:
        from clip_diffusion_tpu.utils.checkpoint import SamplingState

        next_step = -1 if end_pos is None else start - end_pos
        state = SamplingState(
            x=inner[0], step=next_step, eps_history=inner[1],
            history_count=int(inner[2]), key_data=_key_data(key),
        )
        return final_x, frames, state
    return final_x, frames


def compute_phase_segments(pipe: GuidedPipeline, n_steps: int):
    """Host-side: split the descending step sequence into runs with constant
    scheduled cutout counts.  Returns [(steps int32[], (n_ov, n_in)), ...]
    in execution order."""
    sched = pipe.schedule
    cs = pipe.config.cutout_schedules
    ov = np.asarray(cs.num_overview_cuts, np.int64)
    inn = np.asarray(cs.num_inner_cuts, np.int64)
    segments = []
    cur_key = None
    for step in range(n_steps - 1, -1, -1):
        idx = int(np.clip(999 - np.floor(sched.scaled_timesteps[step]), 0, 999))
        key = (int(ov[idx]), int(inn[idx]))
        if key != cur_key:
            segments.append(([step], key))
            cur_key = key
        else:
            segments[-1][0].append(step)
    return [(np.asarray(s, np.int32), k) for s, k in segments]


@functools.lru_cache(maxsize=64)
def _get_segmented_runner(pipe, n_steps, num_frames, progress_callback,
                          progress_every, chunk_size):
    """Phase-segmented chunked runner: one exact-sized executor per
    cutout-schedule phase (no inactive slots), host-chained; each dispatch
    covers at most `chunk_size` steps."""
    segments = compute_phase_segments(pipe, n_steps)
    frame_table, n_frames_eff = _frame_table(n_steps, num_frames)
    execs = {}
    for _, caps in segments:
        if caps not in execs:
            step_fn = build_guided_step(pipe, slot_caps=caps)[0]
            execs[caps] = _make_chunk_exec(
                step_fn, frame_table, progress_callback, progress_every
            )

    def run(params, x, base_key, inner=None, start_pos=0, end_pos=None,
            chunk_times=None, deadline=None):
        shape = x.shape
        frames = jnp.zeros((n_frames_eff,) + shape, jnp.float32)
        if inner is None:
            inner = (x, init_history(shape), jnp.int32(0))
        pos_offset = 0
        for seg_steps, caps in segments:
            positions = np.arange(
                pos_offset, pos_offset + len(seg_steps), dtype=np.int32
            )
            keep = positions >= start_pos
            if end_pos is not None:
                keep &= positions < end_pos
            pos_offset += len(seg_steps)
            if not keep.any():
                continue
            seg_steps = seg_steps[keep]
            positions = positions[keep]
            for s_chunk, p_chunk in zip(
                _chunks(seg_steps, chunk_size), _chunks(positions, chunk_size)
            ):
                if deadline is not None and time.time() > deadline:
                    raise DeadlineExceeded(
                        f"bench deadline passed before chunk at caps={caps}"
                    )
                t0 = time.perf_counter() if chunk_times is not None else None
                inner, frames = execs[caps](
                    params, inner, frames, jnp.asarray(s_chunk),
                    jnp.asarray(p_chunk), base_key,
                )
                if chunk_times is not None:
                    # force completion (block_until_ready does not truly
                    # sync on remote-attached backends; a scalar readback
                    # does) — serializes chunks, so each dt is that
                    # chunk's own execution + one host round-trip
                    int(inner[2])
                    chunk_times.append(
                        (caps, len(s_chunk), time.perf_counter() - t0)
                    )
        return frames, inner

    return run


def _frame_table(n_steps, num_frames):
    frame_at = np.unique(
        np.linspace(0, n_steps - 1, num_frames).astype(np.int64)
    )
    table = np.full(n_steps, -1, dtype=np.int32)
    for slot, pos in enumerate(frame_at):
        table[pos] = slot
    # numpy on purpose: exec_chunk closes over it across independent traces
    return table, len(frame_at)


def _make_chunk_exec(step_fn, frame_table, progress_callback, progress_every):
    """Jitted executor for one chunk of (steps, positions): carries
    (inner sampler state, frames) through a scan."""

    @jax.jit
    def exec_chunk(params, inner, frames, steps, positions, base_key):
        def body(carry, step_and_pos):
            inner, frames = carry
            step, pos = step_and_pos
            inner, pred_x0 = step_fn(params, inner, step, base_key)
            slot = jnp.asarray(frame_table)[pos]
            frames = jax.lax.cond(
                slot >= 0,
                lambda f: jax.lax.dynamic_update_index_in_dim(
                    f, pred_x0, jnp.maximum(slot, 0), 0
                ),
                lambda f: f,
                frames,
            )
            if progress_callback is not None:
                jax.lax.cond(
                    pos % progress_every == 0,
                    lambda: io_callback(
                        progress_callback, None, pos, pred_x0, ordered=False
                    ),
                    lambda: None,
                )
            return (inner, frames), None

        (inner, frames), _ = jax.lax.scan(
            body, (inner, frames), (steps, positions)
        )
        return inner, frames

    return exec_chunk


def _chunks(arr, size):
    for i in range(0, len(arr), size):
        yield arr[i : i + size]


@functools.lru_cache(maxsize=64)
def _get_runner(pipe, n_steps, num_frames, progress_callback, progress_every,
                chunk_size):
    """Host-chained chunked trajectory runner (single padded program; one
    compile per distinct chunk length)."""
    step_fn, _ = build_guided_step(pipe)
    frame_table, n_frames_eff = _frame_table(n_steps, num_frames)
    exec_chunk = _make_chunk_exec(
        step_fn, frame_table, progress_callback, progress_every
    )
    steps_desc = np.arange(n_steps - 1, -1, -1, dtype=np.int32)
    positions = np.arange(n_steps, dtype=np.int32)

    def run(params, x, base_key, inner=None, start_pos=0, end_pos=None):
        shape = x.shape
        frames = jnp.zeros((n_frames_eff,) + shape, jnp.float32)
        if inner is None:
            inner = (x, init_history(shape), jnp.int32(0))
        sl = slice(start_pos, end_pos)
        for s_chunk, p_chunk in zip(
            _chunks(steps_desc[sl], chunk_size),
            _chunks(positions[sl], chunk_size),
        ):
            inner, frames = exec_chunk(
                params, inner, frames, jnp.asarray(s_chunk),
                jnp.asarray(p_chunk), base_key,
            )
        return frames, inner

    return run
