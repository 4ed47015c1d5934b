#!/usr/bin/env python
"""Reproducible per-component breakdown of the 512^2 guided step on TPU.

This is the measurement harness behind STATUS.md's perf table: each
component (per-phase full step, UNet fwd / fwd+bwd, cutout engine,
augmentation, dynamic thresholding, per-CLIP-tower embed) is timed as K
chained iterations inside ONE dispatch (per-dispatch tunnel overhead
amortizes; `block_until_ready` alone does not truly sync on remote-attached
backends, so a host readback forces completion), min over repeats.

    python tools/profile_step.py                 # full breakdown (slow:
                                                 # many remote compiles)
    python tools/profile_step.py --only phases   # one section
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--only", choices=("phases", "unet", "cutouts", "clip",
                                      "sampler", "unet_blocks",
                                      "unet_remat", "phase_blocks"),
                   default=None)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--clips", type=str,
                   default="ViT-B/32,ViT-B/16,ViT-L/14,RN101")
    p.add_argument("--caps", type=str, default="4,2",
                   help="(phase_blocks) 'n_overview,n_inner' cutout caps of "
                        "the phase to decompose")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from clip_diffusion_tpu.config import Config
    from clip_diffusion_tpu.diffusion.sampling import (
        SamplerConfig,
        init_history,
    )
    from clip_diffusion_tpu.guidance.cutouts import (
        CutoutSpec,
        make_cutouts_batch,
    )
    from clip_diffusion_tpu.guidance.losses import (
        square_spherical_distance_loss,
    )
    from clip_diffusion_tpu.models.clip.model import clip_normalize
    from clip_diffusion_tpu.ops.quantile import dynamic_threshold_fast
    from clip_diffusion_tpu.pipeline.guided import build_guided_step
    from clip_diffusion_tpu.zoo import build_models, build_pipeline

    K = args.k
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 512, 512, 3), jnp.float32)
    result = {}

    def timed(name, fn, *fargs):
        t0 = time.time()
        _ = float(jnp.sum(fn(*fargs)))
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(args.repeats):
            t0 = time.time()
            _ = float(jnp.sum(fn(*fargs)))
            best = min(best, time.time() - t0)
        result[name] = {"ms_per_iter": round(best / K * 1000, 1),
                        "compile_s": round(compile_s, 1)}
        print(name, result[name], flush=True)

    def k_grad_loop(body):
        # `body(c, p)` with params threaded as a jit ARGUMENT: closing a
        # big tower's params into the jitted fn serializes them into the
        # HLO and blows the remote-compile request limit (HTTP 413 for
        # ViT-L/14's ~600 MB bf16 tree; see CLAUDE.md).
        @jax.jit
        def run(c, p):
            def step(cc, i):
                g = jax.grad(lambda z: body(z, p))(cc)
                return cc + (1e-6 * g).astype(cc.dtype), None

            cf, _ = jax.lax.scan(step, c, jnp.arange(K))
            return cf

        return run

    want = lambda section: args.only in (None, section)

    pipe = params = None
    if want("phases") or want("unet"):
        config = Config(width=512, height=512,
                        chosen_clip_models=tuple(args.clips.split(",")))
        sampler = SamplerConfig(mode="ddim", steps=250, eta=0.8)
        print("building models...", flush=True)
        models = build_models(config, image_size=512,
                              param_dtype=jnp.bfloat16)
        pipe, params = build_pipeline(
            models, config, [("a beautiful landscape painting", 1.0)],
            sampler,
        )

    if want("phases"):
        for caps in [(14, 2), (12, 4), (4, 2), (0, 12)]:
            step_fn, _ = build_guided_step(pipe, slot_caps=caps)
            phase_step = {(14, 2): 249, (12, 4): 199, (4, 2): 120,
                          (0, 12): 20}[caps]

            @jax.jit
            def run_phase(p, xx, step_fn=step_fn, phase_step=phase_step):
                carry = (xx, init_history(xx.shape), jnp.int32(0))

                def body(c, i):
                    c, _ = step_fn(p, c, jnp.int32(phase_step), key)
                    return c, None

                (xf, _, _), _ = jax.lax.scan(body, carry, jnp.arange(K))
                return xf

            timed(f"step_phase_{caps[0]}ov_{caps[1]}in", run_phase,
                  params, x)

    if want("unet"):
        unet_apply = pipe.unet_apply
        t_b = jnp.full((1,), 500.0)

        @jax.jit
        def unet_fwd_k(p, xx):
            def body(c, i):
                out = unet_apply(p["unet"], c, t_b)
                return c + 1e-6 * out[..., :3].astype(c.dtype), None

            xf, _ = jax.lax.scan(body, xx, jnp.arange(K))
            return xf

        @jax.jit
        def unet_fwdbwd_k(p, xx):
            def loss(z):
                return jnp.sum(
                    unet_apply(p["unet"], z, t_b).astype(jnp.float32) ** 2
                )

            def body(c, i):
                return c + 1e-6 * jax.grad(loss)(c), None

            xf, _ = jax.lax.scan(body, xx, jnp.arange(K))
            return xf

        timed("unet_fwd", unet_fwd_k, params, x)
        timed("unet_fwd_bwd", unet_fwdbwd_k, params, x)

    if want("unet_blocks"):
        # Per-resolution-level breakdown of the 552M UNet (VERDICT r3 item
        # 2): each level's ResBlock and AttentionBlock timed standalone at
        # its REAL 512^2-canvas shape, fwd+bwd, with achieved TF/s vs the
        # 137 TF/s bf16 measured roof.  Levels (mult 0.5,1,1,2,2,4,4):
        #   ds=1  512^2 x128   | ds=2 256^2 x256 | ds=4 128^2 x256
        #   ds=8  64^2  x512   | ds=16 32^2 x512 +attn
        #   ds=32 16^2  x1024 +attn | ds=64 8^2 x1024 +attn
        from clip_diffusion_tpu.models.unet import (
            AttentionBlock,
            ResBlock,
            UNetConfig,
        )

        cfg = UNetConfig.for_image_size(512)
        mc = cfg.model_channels
        time_dim = mc * 4
        emb = jax.random.normal(key, (1, time_dim), jnp.bfloat16)
        tf_roof = 137.0

        def res_flops(hw, cin, cout):
            # two 3x3 convs + optional 1x1 skip (emb dense negligible)
            f = hw * cin * cout * 9 * 2 + hw * cout * cout * 9 * 2
            if cin != cout:
                f += hw * cin * cout * 2
            return f

        def attn_flops(hw, c):
            return (hw * c * 3 * c * 2      # qkv
                    + 2 * hw * hw * c * 2   # qk^T + a@v
                    + hw * c * c * 2)       # proj

        ds = 1
        blocks = []
        prev_ch = int(cfg.channel_mult[0] * mc)
        for level, mult in enumerate(cfg.channel_mult):
            ch = int(mult * mc)
            size = 512 // ds
            blocks.append(("res", level, size, prev_ch, ch))
            if ds in cfg.attention_ds:
                blocks.append(("attn", level, size, ch, ch))
            prev_ch = ch
            ds *= 2

        for kind, level, size, cin, cout in blocks:
            hw = size * size
            if kind == "res":
                mod = ResBlock(out_channels=cout, dtype=jnp.bfloat16)
                xx = jax.random.normal(key, (1, size, size, cin),
                                       jnp.bfloat16)
                prm = mod.init(jax.random.PRNGKey(level), xx, emb)
                fl = 3 * res_flops(hw, cin, cout)  # fwd+bwd ~= 3x fwd

                def loss(z, p, mod=mod):
                    return jnp.sum(mod.apply(p, z, emb)
                                   .astype(jnp.float32) ** 2)
            else:
                mod = AttentionBlock(
                    num_head_channels=cfg.num_head_channels,
                    dtype=jnp.bfloat16)
                xx = jax.random.normal(key, (1, size, size, cin),
                                       jnp.bfloat16)
                prm = mod.init(jax.random.PRNGKey(level), xx)
                fl = 3 * attn_flops(hw, cin)

                def loss(z, p, mod=mod):
                    return jnp.sum(mod.apply(p, z).astype(jnp.float32) ** 2)

            name = f"L{level}_{kind}_{size}px_{cin}to{cout}"
            timed(name, k_grad_loop(loss), xx, prm)
            ms = result[name]["ms_per_iter"]
            result[name]["gflop_fwdbwd"] = round(fl / 1e9, 1)
            result[name]["tflops"] = round(fl / (ms / 1e3) / 1e12, 1)
            result[name]["pct_roof"] = round(
                100 * fl / (ms / 1e3) / 1e12 / tf_roof)
            print("   ->", {k: result[name][k]
                            for k in ("gflop_fwdbwd", "tflops", "pct_roof")},
                  flush=True)

    if want("unet_remat"):
        # whole-model fwd+bwd under the three remat policies: "full"
        # (production default: recomputes the entire fwd during bwd =
        # ~4/3 x the no-remat FLOPs), "dots" (saves conv/matmul outputs),
        # and off.  If "dots"/off fit HBM inside the guided step, the
        # recompute tax is recoverable.
        import dataclasses as dc

        from clip_diffusion_tpu.models.unet import UNetConfig, UNetModel
        from clip_diffusion_tpu.zoo import _host_init

        t_b = jnp.full((1,), 500.0)
        for label, kw in (
            ("remat_full", dict(remat=True, remat_policy="full")),
            ("remat_dots", dict(remat=True, remat_policy="dots")),
            ("remat_off", dict(remat=False)),
        ):
            ucfg = dc.replace(UNetConfig.for_image_size(512), **kw)
            model = UNetModel(ucfg)
            prm = _host_init(
                lambda: model.init(jax.random.PRNGKey(0),
                                   jnp.ones((1, 64, 64, 3)),
                                   jnp.zeros((1,)))
            )

            def loss(z, p, model=model):
                return jnp.sum(
                    model.apply(p, z, t_b).astype(jnp.float32) ** 2
                )

            try:
                timed(f"unet_fwdbwd_{label}", k_grad_loop(loss), x, prm)
            except Exception as e:  # noqa: BLE001 — OOM is a data point
                result[f"unet_fwdbwd_{label}"] = {"error": str(e)[:200]}
                print(f"unet_fwdbwd_{label} FAILED: {str(e)[:200]}",
                      flush=True)
            del prm

    if want("phase_blocks"):
        # Per-block decomposition of ONE phase's step at its real cutout
        # caps (VERDICT r4 item 5: the (0,12) 378 ms and (4,2) 236 ms
        # phases — 230 of 250 executed steps — had never been profiled
        # per-block; only the 16-cut phase had).  Times, at caps
        # (n_ov, n_in) with repeats=4 => n_cuts = 4*(n_ov+n_in) per tower:
        #   - whole phase step (reference number, same program as bench)
        #   - cutout engine fwd+bwd at caps
        #   - each tower's embed+spherical-loss fwd+bwd at n_cuts
        #   - UNet fwd+bwd (fixed cost, phase-independent)
        #   - dynamic threshold
        # Sum-of-blocks vs whole-step quantifies XLA's cross-block overlap
        # and what a per-block win could buy at step level.
        caps = tuple(int(v) for v in args.caps.split(","))
        n_cuts = 4 * (caps[0] + caps[1])
        if pipe is None:
            config = Config(width=512, height=512,
                            chosen_clip_models=tuple(args.clips.split(",")))
            sampler = SamplerConfig(mode="ddim", steps=250, eta=0.8)
            print("building models...", flush=True)
            models = build_models(config, image_size=512,
                                  param_dtype=jnp.bfloat16)
            pipe, params = build_pipeline(
                models, config, [("a beautiful landscape painting", 1.0)],
                sampler,
            )
        phase_step = {(14, 2): 249, (12, 4): 199, (4, 2): 120,
                      (0, 12): 20}.get(caps, 120)
        step_fn, _ = build_guided_step(pipe, slot_caps=caps)

        @jax.jit
        def run_phase(p, xx):
            carry = (xx, init_history(xx.shape), jnp.int32(0))

            def body(c, i):
                c, _ = step_fn(p, c, jnp.int32(phase_step), key)
                return c, None

            (xf, _, _), _ = jax.lax.scan(body, carry, jnp.arange(K))
            return xf

        timed(f"whole_step_{caps[0]}ov_{caps[1]}in", run_phase, params, x)

        spec = CutoutSpec(cut_size=224, max_overview=caps[0],
                          max_inner=caps[1])

        def cuts_loss(xx, _p):
            cuts, w = make_cutouts_batch(
                xx.astype(jnp.bfloat16), key, jnp.int32(caps[0]),
                jnp.int32(caps[1]), jnp.float32(5.0), jnp.float32(0.7),
                spec, repeats=4,
            )
            return jnp.sum(cuts.astype(jnp.float32))

        timed(f"cutouts_{n_cuts}_fwd_bwd", k_grad_loop(cuts_loss), x, None)

        cuts = jax.random.uniform(key, (n_cuts, 224, 224, 3), jnp.bfloat16)
        for i, perc in enumerate(pipe.perceptors):
            pp = params["perceptors"][i]

            def embed_loss(c, pp, perc=perc):
                e = perc.embed_image(pp["clip"], clip_normalize(c))
                d = square_spherical_distance_loss(
                    e[:, None, :], pp["text_embeddings"][None, :, :]
                )
                return jnp.sum(d)

            tag = perc.name.replace("/", "_")
            timed(f"clip_{tag}_fwdbwd_{n_cuts}", k_grad_loop(embed_loss),
                  cuts, pp)

        unet_apply = pipe.unet_apply
        t_b = jnp.full((1,), 500.0)

        @jax.jit
        def unet_fwdbwd_k(p, xx):
            def loss(z):
                return jnp.sum(
                    unet_apply(p["unet"], z, t_b).astype(jnp.float32) ** 2
                )

            def body(c, i):
                return c + 1e-6 * jax.grad(loss)(c), None

            xf, _ = jax.lax.scan(body, xx, jnp.arange(K))
            return xf

        timed("unet_fwd_bwd", unet_fwdbwd_k, params, x)

        @jax.jit
        def thr_k(c):
            def body(cc, i):
                return dynamic_threshold_fast(cc * 1.001, 0.995), None

            cf, _ = jax.lax.scan(body, c, jnp.arange(K))
            return cf

        timed("threshold_histogram", thr_k, x)
        whole = result[f"whole_step_{caps[0]}ov_{caps[1]}in"]["ms_per_iter"]
        blocks = sum(
            v["ms_per_iter"] for k, v in result.items()
            if not k.startswith("whole_step")
        )
        result["sum_blocks_vs_whole"] = {
            "sum_blocks_ms": round(blocks, 1),
            "whole_step_ms": round(whole, 1),
            "overlap_pct": round(100 * (blocks - whole) / blocks, 1),
        }
        print("sum_blocks_vs_whole", result["sum_blocks_vs_whole"],
              flush=True)

    if want("cutouts"):
        spec = CutoutSpec(cut_size=224, max_overview=14, max_inner=2)

        def cuts_loss(xx, _p):
            cuts, w = make_cutouts_batch(
                xx.astype(jnp.bfloat16), key, jnp.int32(14), jnp.int32(2),
                jnp.float32(5.0), jnp.float32(0.7), spec, repeats=4,
            )
            return jnp.sum(cuts.astype(jnp.float32))

        timed("cutouts_64_fwd_bwd", k_grad_loop(cuts_loss), x, None)

    if want("sampler"):
        @jax.jit
        def thr_k(c):
            def body(cc, i):
                return dynamic_threshold_fast(cc * 1.001, 0.995), None

            cf, _ = jax.lax.scan(body, c, jnp.arange(K))
            return cf

        timed("threshold_histogram", thr_k, x)

    if want("clip"):
        if pipe is None:
            config = Config(width=512, height=512,
                            chosen_clip_models=tuple(args.clips.split(",")))
            sampler = SamplerConfig(mode="ddim", steps=250, eta=0.8)
            models = build_models(config, image_size=512,
                                  param_dtype=jnp.bfloat16)
            pipe, params = build_pipeline(
                models, config,
                [("a beautiful landscape painting", 1.0)], sampler,
            )
        cuts = jax.random.uniform(key, (64, 224, 224, 3), jnp.bfloat16)
        for i, perc in enumerate(pipe.perceptors):
            pp = params["perceptors"][i]

            def embed_loss(c, pp, perc=perc):
                e = perc.embed_image(pp["clip"], clip_normalize(c))
                d = square_spherical_distance_loss(
                    e[:, None, :], pp["text_embeddings"][None, :, :]
                )
                return jnp.sum(d)

            tag = perc.name.replace("/", "_")
            timed(f"clip_{tag}_fwdbwd_64", k_grad_loop(embed_loss), cuts, pp)

    print("BREAKDOWN " + json.dumps(result))


if __name__ == "__main__":
    main()
