"""Every package module imports cleanly, and the public symbols the
migration guide (docs/MIGRATION.md) maps reference users to actually exist.

The reference package has heavyweight import side effects (model loads at
import, reference sample.py:52-56, anvil_utils.py:19-33); this framework
deliberately has none — importing any module must be cheap and safe, which
is what the walk asserts.
"""

import importlib
import pkgutil

import clip_diffusion_tpu


def test_all_modules_import():
    failures = []
    # onerror: a subpackage whose __init__ fails to import would otherwise
    # abort the walk itself and hide every module after it (ADVICE r3)
    for mod in pkgutil.walk_packages(clip_diffusion_tpu.__path__,
                                     prefix="clip_diffusion_tpu.",
                                     onerror=lambda name: failures.append(
                                         f"{name}: package walk error")):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001 — collect all, report once
            failures.append(f"{mod.name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


# (module, symbol) pairs promised by docs/MIGRATION.md's "Here" column.
MIGRATION_SURFACE = [
    ("clip_diffusion_tpu.sample", "guided_diffusion_sample"),
    ("clip_diffusion_tpu.sample", "latent_diffusion_sample"),
    ("clip_diffusion_tpu.config", "Config"),
    ("clip_diffusion_tpu.config", "create_schedule"),
    ("clip_diffusion_tpu.config", "schedule_array"),
    ("clip_diffusion_tpu.guidance.cutouts", "make_cutouts"),
    ("clip_diffusion_tpu.guidance.cutouts", "make_cutouts_batch"),
    ("clip_diffusion_tpu.ops.augment", "augment_batch"),
    ("clip_diffusion_tpu.guidance.losses", "square_spherical_distance_loss"),
    ("clip_diffusion_tpu.guidance.losses", "total_variational_loss"),
    ("clip_diffusion_tpu.guidance.losses", "rgb_range_loss"),
    ("clip_diffusion_tpu.guidance.losses", "aesthetic_loss"),
    ("clip_diffusion_tpu.guidance.losses", "structural_dissimilarity_loss"),
    ("clip_diffusion_tpu.guidance.losses", "l2_normalize"),
    ("clip_diffusion_tpu.guidance.score", "clip_scores"),
    ("clip_diffusion_tpu.diffusion.sampling", "dynamic_threshold"),
    ("clip_diffusion_tpu.diffusion.sampling", "SamplerConfig"),
    ("clip_diffusion_tpu.diffusion.schedule", "make_schedule"),
    ("clip_diffusion_tpu.zoo", "build_models"),
    ("clip_diffusion_tpu.zoo", "build_latent_models"),
    ("clip_diffusion_tpu.zoo", "build_pipeline"),
    ("clip_diffusion_tpu.zoo", "build_esrgan"),
    ("clip_diffusion_tpu.zoo", "load_or_init_clip"),
    ("clip_diffusion_tpu.runtime.registry", "UNetRegistry"),
    ("clip_diffusion_tpu.models.t5", "load_or_init_sentence_t5"),
    ("clip_diffusion_tpu.models.aesthetic", "LinearAestheticPredictor"),
    ("clip_diffusion_tpu.models.aesthetic", "MLPAestheticPredictor"),
    ("clip_diffusion_tpu.models.aesthetic", "make_aesthetic_predictor"),
    ("clip_diffusion_tpu.models.esrgan", "super_resolution_folder"),
    ("clip_diffusion_tpu.models.esrgan", "upscale"),
    ("clip_diffusion_tpu.models.clip", "tokenize"),
    ("clip_diffusion_tpu.text.prompt", "Prompt"),
    ("clip_diffusion_tpu.text.prompt", "load_modifier_bank"),
    ("clip_diffusion_tpu.text.zh", "contains_zh"),
    ("clip_diffusion_tpu.text.zh", "tw_to_simplified"),
    ("clip_diffusion_tpu.text.zh", "translate_zh_to_en"),
    ("clip_diffusion_tpu.text.retrieval", "EmbeddingIndex"),
    ("clip_diffusion_tpu.text.retrieval", "build_embedding_index"),
    ("clip_diffusion_tpu.parallel.serving", "get_seed"),
    ("clip_diffusion_tpu.parallel.serving", "change_settings"),
    ("clip_diffusion_tpu.parallel.serving", "get_random_prompt"),
    ("clip_diffusion_tpu.parallel.serving", "get_chosen_image"),
    ("clip_diffusion_tpu.parallel.serving", "analyze_image"),
    ("clip_diffusion_tpu.parallel.serving", "serve_guided_batch"),
    ("clip_diffusion_tpu.parallel.serving", "serve_latent_batch"),
    ("clip_diffusion_tpu.runtime.server", "ClipDiffusionServer"),
    ("clip_diffusion_tpu.runtime.bootstrap", "build_service"),
    ("clip_diffusion_tpu.utils.image_io", "normalize_image_neg_one_to_one"),
    ("clip_diffusion_tpu.utils.image_io", "denormalize_image_zero_to_one"),
    ("clip_diffusion_tpu.utils.image_io", "image_to_array"),
    ("clip_diffusion_tpu.utils.image_io", "array_to_image"),
    ("clip_diffusion_tpu.utils.image_io", "load_image"),
    ("clip_diffusion_tpu.utils.image_io", "load_mask"),
    ("clip_diffusion_tpu.utils.image_io", "create_gif"),
    ("clip_diffusion_tpu.utils.image_io", "make_grid"),
    ("clip_diffusion_tpu.utils.image_io", "draw_index_on_grid_image"),
    ("clip_diffusion_tpu.utils.progress", "store_task_state"),
    ("clip_diffusion_tpu.utils.progress", "default_uploader"),
    ("clip_diffusion_tpu.utils.profiling", "clear_device_cache"),
    ("clip_diffusion_tpu.utils.seeds", "random_seed"),
    ("clip_diffusion_tpu.utils.dirs", "make_dir"),
    ("clip_diffusion_tpu.utils.dirs", "list_images"),
    ("clip_diffusion_tpu.utils.checkpoint", "load_validated_params"),
]


def test_migration_surface_exists():
    missing = []
    for mod_name, sym in MIGRATION_SURFACE:
        mod = importlib.import_module(mod_name)
        if not hasattr(mod, sym):
            missing.append(f"{mod_name}.{sym}")
    assert not missing, "\n".join(missing)
