#!/usr/bin/env python
"""Fetch public checkpoints and convert them to Flax trees.

Run in a NETWORKED environment (the build/CI container here is zero-egress).
Downloads the same public artifacts the reference uses (URLs mirrored from
reference models.py:11-30 + tokenizer assets), converts each torch state
dict with models/convert.py, and stores orbax checkpoints under
models/flax/.

Usage:
    python tools/fetch_and_convert.py --all
    python tools/fetch_and_convert.py --unet --clip ViT-B/32
"""

import argparse
import os
import sys
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODEL_DIR = "models"
FLAX_DIR = os.path.join(MODEL_DIR, "flax")

ARTIFACTS = {
    "unet": (
        "https://huggingface.co/lowlevelware/512x512_diffusion_unconditional_"
        "ImageNet/resolve/main/512x512_diffusion_uncond_finetune_008100.pt",
        "512x512_diffusion_uncond_finetune_008100.pt",
    ),
    "ldm": (
        "https://huggingface.co/multimodalart/compvis-latent-diffusion-"
        "text2img-large/resolve/main/txt2img-f8-large-jack000-finetuned-fp16.ckpt",
        "txt2img-f8-large-jack000-finetuned-fp16.ckpt",
    ),
    "esrgan_x4": (
        "https://github.com/xinntao/Real-ESRGAN/releases/download/v0.1.0/"
        "RealESRGAN_x4plus.pth",
        "RealESRGAN_x4plus.pth",
    ),
    "esrgan_x2": (
        "https://github.com/xinntao/Real-ESRGAN/releases/download/v0.2.1/"
        "RealESRGAN_x2plus.pth",
        "RealESRGAN_x2plus.pth",
    ),
    "bpe": (
        "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6"
        ".txt.gz",
        os.path.join("data", "bpe_simple_vocab_16e6.txt.gz"),
    ),
    "bert_vocab": (
        "https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt",
        os.path.join("data", "bert-base-uncased-vocab.txt"),
    ),
    "t5_spm": (
        "https://huggingface.co/sentence-transformers/sentence-t5-base/"
        "resolve/main/spiece.model",
        os.path.join("data", "t5-spiece.model"),
    ),
    # the two files the lpips pip package assembles at import: torchvision's
    # VGG16 backbone + the learned lin heads (reference sample.py:52)
    "vgg16": (
        "https://download.pytorch.org/models/vgg16-397923af.pth",
        "vgg16-397923af.pth",
    ),
    "lpips_lin": (
        "https://github.com/richzhang/PerceptualSimilarity/raw/master/"
        "lpips/weights/v0.1/vgg.pth",
        "lpips_vgg_v0.1.pth",
    ),
}

AESTHETIC = {
    "ViT-B/32": (
        "https://github.com/crowsonkb/simulacra-aesthetic-models/raw/master/"
        "models/sac_public_2022_06_29_vit_b_32_linear.pth",
        "sac_public_2022_06_29_vit_b_32_linear.pth",
    ),
    "ViT-B/16": (
        "https://github.com/crowsonkb/simulacra-aesthetic-models/raw/master/"
        "models/sac_public_2022_06_29_vit_b_16_linear.pth",
        "sac_public_2022_06_29_vit_b_16_linear.pth",
    ),
    "ViT-L/14": (
        "https://github.com/christophschuhmann/improved-aesthetic-predictor/"
        "raw/main/sac%2Blogos%2Bava1-l14-linearMSE.pth",
        "sac+logos+ava1-l14-linearMSE.pth",
    ),
}

CLIP_JIT = {
    # OpenAI CLIP distribution (jit archives; load with torch and take
    # state_dict()).
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
}


def _download(url: str, dest: str):
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    if os.path.exists(dest):
        print(f"cached: {dest}")
        return dest
    print(f"downloading {url} -> {dest}")
    tmp = dest + ".tmp"
    opener = urllib.request.build_opener()
    opener.addheaders = [("User-Agent", "Mozilla/5.0")]
    with opener.open(url) as src, open(tmp, "wb") as out:
        while True:
            buf = src.read(1 << 16)
            if not buf:
                break
            out.write(buf)
    os.rename(tmp, dest)
    return dest


def convert_unet_ckpt(path: str):
    from clip_diffusion_tpu.models.convert import (
        convert_unet,
        load_torch_state_dict,
    )
    from clip_diffusion_tpu.utils.checkpoint import save_params

    params = convert_unet(load_torch_state_dict(path))
    out = os.path.join(FLAX_DIR, "guided_unet_512")
    save_params(out, params)
    print(f"converted -> {out}")


def convert_ldm_ckpt(path: str):
    """Split + convert the CompVis LatentDiffusion checkpoint into the three
    orbax trees zoo.build_latent_models loads (ldm_unet / ldm_vq /
    ldm_bert)."""
    from clip_diffusion_tpu.models.convert import load_torch_state_dict
    from clip_diffusion_tpu.models.ldm.convert import convert_ldm_checkpoint
    from clip_diffusion_tpu.utils.checkpoint import save_params

    trees = convert_ldm_checkpoint(load_torch_state_dict(path))
    for sub, tree in trees.items():
        out = os.path.join(FLAX_DIR, f"ldm_{sub}")
        save_params(out, tree)
        print(f"converted -> {out}")


def convert_esrgan_ckpt(path: str, scale: int):
    from clip_diffusion_tpu.models.convert import load_torch_state_dict
    from clip_diffusion_tpu.models.esrgan import convert_rrdbnet
    from clip_diffusion_tpu.utils.checkpoint import save_params

    params = convert_rrdbnet(load_torch_state_dict(path))
    out = os.path.join(FLAX_DIR, f"esrgan_x{scale}")
    save_params(out, params)
    print(f"converted -> {out}")


def convert_aesthetic_ckpt(name: str, path: str):
    from clip_diffusion_tpu.models.aesthetic import convert_aesthetic
    from clip_diffusion_tpu.models.convert import load_torch_state_dict
    from clip_diffusion_tpu.utils.checkpoint import save_params

    params = convert_aesthetic(load_torch_state_dict(path))
    out = os.path.join(FLAX_DIR, f"aesthetic_{name.replace('/', '_')}")
    save_params(out, params)
    print(f"converted -> {out}")


def convert_lpips_ckpt(vgg_path: str, lin_path: str):
    from clip_diffusion_tpu.models.convert import load_torch_state_dict
    from clip_diffusion_tpu.models.lpips import convert_lpips_parts
    from clip_diffusion_tpu.utils.checkpoint import save_params

    params = convert_lpips_parts(
        load_torch_state_dict(vgg_path), load_torch_state_dict(lin_path)
    )
    out = os.path.join(FLAX_DIR, "lpips_vgg")
    save_params(out, params)
    print(f"converted -> {out}")


def convert_clip_ckpt(name: str, path: str):
    import torch

    from clip_diffusion_tpu.models.convert import (
        convert_clip,
        load_torch_state_dict,
    )
    from clip_diffusion_tpu.utils.checkpoint import save_params

    try:  # OpenAI distributes CLIP as torch.jit archives
        model = torch.jit.load(path, map_location="cpu")
        sd = {k: v for k, v in model.state_dict().items()}
    except RuntimeError:  # plain state-dict checkpoint
        sd = load_torch_state_dict(path)
    params = convert_clip(sd)
    out = os.path.join(FLAX_DIR, f"clip_{name.replace('/', '_')}")
    save_params(out, params)
    print(f"converted -> {out}")


def convert_marian_ckpt():
    """Fetch Helsinki-NLP/opus-mt-zh-en via transformers and convert to the
    native Flax Marian (models/marian.py) + tokenizer assets under
    data/marian/ (the paths text/zh.py's native gate looks for)."""
    import shutil

    from transformers import MarianMTModel, MarianTokenizer

    from clip_diffusion_tpu.models.marian import MarianConfig, convert_marian
    from clip_diffusion_tpu.utils.checkpoint import save_params

    name = "Helsinki-NLP/opus-mt-zh-en"
    hf = MarianMTModel.from_pretrained(name)
    params = convert_marian(hf.state_dict(), MarianConfig.opus_zh_en())
    out = os.path.join("data", "marian")
    os.makedirs(out, exist_ok=True)
    save_params(os.path.join(out, "params"), params)
    tok = MarianTokenizer.from_pretrained(name)
    tmp = os.path.join(out, "_tok")
    tok.save_pretrained(tmp)
    shutil.copy(os.path.join(tmp, "source.spm"), os.path.join(out, "source.spm"))
    shutil.copy(os.path.join(tmp, "vocab.json"), os.path.join(out, "vocab.json"))
    shutil.rmtree(tmp)
    print(f"converted -> {out}")


def convert_t5_ckpt():
    """Fetch sentence-transformers/sentence-t5-base via transformers and
    convert to the native Flax SentenceT5 under data/t5/params (the path
    models/t5.load_or_init_sentence_t5 looks for)."""
    from clip_diffusion_tpu.models.t5 import convert_sentence_t5
    from clip_diffusion_tpu.utils.checkpoint import save_params

    from sentence_transformers import SentenceTransformer

    st = SentenceTransformer("sentence-transformers/sentence-t5-base")
    sd = {k: v for k, v in st.state_dict().items()}
    params = convert_sentence_t5(sd)
    out = os.path.join("data", "t5", "params")
    save_params(out, params)
    print(f"converted -> {out}")


OPENCC_DICT_BASE = (
    "https://raw.githubusercontent.com/BYVoid/OpenCC/master/data/dictionary/"
)
OPENCC_DICTS = ("TWPhrasesIT.txt", "TWPhrasesName.txt", "TWPhrasesOther.txt",
                "TWVariants.txt", "TSPhrases.txt", "TSCharacters.txt")


def _parse_opencc_dict(path):
    """OpenCC dictionary format: `key<TAB>value1 value2 ...` per line."""
    entries = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2 and parts[0]:
                entries.append((parts[0], parts[1].split(" ")))
    return entries


def convert_opencc_tw2sp():
    """Vendor OpenCC's full tw2sp phrase vocabulary as a TSV asset
    (`data/opencc/tw2sp_phrases.tsv`) so `text.zh.tw_to_simplified`
    matches real OpenCC without the opencc wheel (reference prompt.py:17;
    the built-in ~130 curated phrases stay as the no-asset tier).

    For every Taiwan-variant phrase in TWPhrases{IT,Name,Other} +
    TWVariants, the mainland-simplified output is computed with the
    opencc wheel when importable (bit-exact), else with a faithful
    mini-chain of OpenCC's own data: reverse TW mapping -> TSPhrases
    (longest-first) -> TSCharacters."""
    dict_dir = os.path.join("data", "opencc", "raw")
    paths = {
        n: _download(OPENCC_DICT_BASE + n, os.path.join(dict_dir, n))
        for n in OPENCC_DICTS
    }
    # TW phrases: standard-Traditional key -> Taiwan variants; we need the
    # reverse direction (first variant is canonical, all map back)
    tw_to_std = {}
    for n in ("TWPhrasesIT.txt", "TWPhrasesName.txt", "TWPhrasesOther.txt",
              "TWVariants.txt"):
        for std, variants in _parse_opencc_dict(paths[n]):
            for v in variants:
                tw_to_std.setdefault(v, std)

    try:
        from opencc import OpenCC  # exact when available

        cc = OpenCC("tw2sp.json")
        to_simplified = cc.convert
    except Exception:
        ts_phrases = {
            k: vs[0] for k, vs in _parse_opencc_dict(paths["TSPhrases.txt"])
        }
        ts_chars = {
            k: vs[0]
            for k, vs in _parse_opencc_dict(paths["TSCharacters.txt"])
        }
        max_len = max(map(len, ts_phrases), default=1)

        def t2s(text):
            out, i = [], 0
            while i < len(text):
                for ln in range(min(max_len, len(text) - i), 1, -1):
                    seg = text[i:i + ln]
                    if seg in ts_phrases:
                        out.append(ts_phrases[seg])
                        i += ln
                        break
                else:
                    out.append(ts_chars.get(text[i], text[i]))
                    i += 1
            return "".join(out)

        def to_simplified(tw):
            return t2s(tw_to_std.get(tw, tw))

    rows = []
    for tw in sorted(tw_to_std):
        sp = to_simplified(tw)
        if sp != tw:
            rows.append((tw, sp))
    out_path = os.path.join("data", "opencc", "tw2sp_phrases.tsv")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("# OpenCC tw2sp phrase vocabulary (generated by "
                "tools/fetch_and_convert.py --opencc)\n")
        for tw, sp in rows:
            f.write(f"{tw}\t{sp}\n")
    print(f"wrote {len(rows)} tw2sp phrases -> {out_path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--all", action="store_true")
    p.add_argument("--unet", action="store_true")
    p.add_argument("--ldm", action="store_true")
    p.add_argument("--esrgan", action="store_true")
    p.add_argument("--aesthetic", action="store_true")
    p.add_argument("--lpips", action="store_true")
    p.add_argument("--vocab", action="store_true")
    p.add_argument("--marian", action="store_true")
    p.add_argument("--t5", action="store_true")
    p.add_argument("--clip", action="append", default=[])
    p.add_argument("--opencc", action="store_true",
                   help="vendor OpenCC's tw2sp phrase vocabulary as "
                        "data/opencc/tw2sp_phrases.tsv (text/zh.py loads "
                        "it without the opencc wheel)")
    p.add_argument("--banks", action="store_true",
                   help="after converting, regenerate data/banks embedding "
                        "banks with the (now-real) towers "
                        "(tools/build_banks.py --all)")
    args = p.parse_args(argv)

    os.makedirs(FLAX_DIR, exist_ok=True)
    if args.all or args.vocab:
        _download(*ARTIFACTS["bpe"])
        _download(*ARTIFACTS["bert_vocab"])
        _download(*ARTIFACTS["t5_spm"])
    if args.all or args.unet:
        url, name = ARTIFACTS["unet"]
        convert_unet_ckpt(_download(url, os.path.join(MODEL_DIR, name)))
    if args.all or args.ldm:
        url, name = ARTIFACTS["ldm"]
        convert_ldm_ckpt(_download(url, os.path.join(MODEL_DIR, name)))
    clips = list(CLIP_JIT) if args.all else args.clip
    for name in clips:
        path = _download(
            CLIP_JIT[name],
            os.path.join(MODEL_DIR, f"CLIP_{name.replace('/', '_')}.pt"),
        )
        convert_clip_ckpt(name, path)
    if args.all or args.esrgan:
        for k, scale in (("esrgan_x4", 4), ("esrgan_x2", 2)):
            url, name = ARTIFACTS[k]
            convert_esrgan_ckpt(
                _download(url, os.path.join(MODEL_DIR, name)), scale
            )
    if args.all or args.aesthetic:
        for name, (url, fname) in AESTHETIC.items():
            convert_aesthetic_ckpt(
                name, _download(url, os.path.join(MODEL_DIR, fname))
            )
    if args.all or args.lpips:
        vgg_url, vgg_name = ARTIFACTS["vgg16"]
        lin_url, lin_name = ARTIFACTS["lpips_lin"]
        convert_lpips_ckpt(
            _download(vgg_url, os.path.join(MODEL_DIR, vgg_name)),
            _download(lin_url, os.path.join(MODEL_DIR, lin_name)),
        )
    if args.all or args.opencc:
        convert_opencc_tw2sp()
    if args.all or args.marian:
        convert_marian_ckpt()
    if args.all or args.t5:
        convert_t5_ckpt()
    if args.all or args.banks:
        # regenerate retrieval/analysis banks from the converted towers —
        # the committed data/banks were built with random towers (honest
        # placeholder, data/README.md) and MUST be rebuilt post-conversion
        # for auto-modifiers / analyze_image to rank meaningfully
        import tools.build_banks as bb

        bb.main(["--all"])
    print("done")


if __name__ == "__main__":
    main()
