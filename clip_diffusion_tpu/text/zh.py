"""Chinese prompt handling: detection, Traditional->Simplified, zh->en.

The reference detects CJK via the regex [\\u4e00-\\u9FFF] (reference
prompt.py:35-39), converts Traditional->Simplified with OpenCC "tw2sp"
(prompt.py:17,48) and translates with HF MarianMT Helsinki-NLP/opus-mt-zh-en
(prompt.py:12-16,41-53).

This module keeps those capabilities behind graceful gates:
* OpenCC if importable, else a built-in character-level TW->simplified table
  covering the frequent cases (phrase-level conversions degrade to
  char-level; adequate since the text goes straight into a translator);
* MarianMT through `transformers` when its weights are present locally
  (zero-egress images can't download them), else identity with a warning.
  A custom translator can be injected for serving deployments.
"""

from __future__ import annotations

import functools
import re
import warnings
from typing import Callable, Optional

_ZH_RE = re.compile(r"[一-鿿]")

# Compact Traditional -> Simplified character table (most frequent
# divergent characters; char-level fallback for the OpenCC tw2sp step).
_T2S = str.maketrans(
    "萬與醜專業叢東絲丟兩嚴喪個爿豐臨為麗舉麼義烏樂喬習鄉書買亂爭於虧雲亞產畝親褻嚲億僅從侖倉儀們價眾優會傴傘偉傳傷倀倫傯佇體餘傭僉俠侶僥偵側僑儈儕儂俁儔儼倆儷儉債傾傮僂剮劊別刪剄則剛創刪勸辦務勱動勵勁勞勢勳猛勩勻匭匱區醫華協單賣盧鹵臥衛卻巹廠廳歷厲壓厭厙參靉靆雙發變敘疊葉號嘆嘰籲後嚇呂嗎唚噸聽啟吳嘸囈嘔嚦唄員咼嗆嗚詠哢嚨嚀噝吒噅鹹呱響啞噠嘵嗶噦嘩噲嚌噥喲嘜嗊嘮啢嗩唕喚呼嘖嗇囀齧囉嘽嘯噴嘍嚳囁嗬噯噓嚶囑嚕劈囂謔團園囪圍圇國圖圓聖壙場阪壞塊堅壇壢壩塢墳墜壟壟壚壘墾坰堊墊埡墶壋塏堖塒塤堝墊垻壪壎堯報場"
    ,
    "万与丑专业丛东丝丢两严丧个丬丰临为丽举么义乌乐乔习乡书买乱争于亏云亚产亩亲亵亸亿仅从仑仓仪们价众优会伛伞伟传伤伥伦偬伫体余佣佥侠侣侥侦侧侨侩侪侬俣俦俨俩俪俭债倾倮偻剐刽别删刭则刚创刬劝办务劢动励劲劳势勋猛勚匀匦匮区医华协单卖卢卤卧卫却卺厂厅历厉压厌厍参叆叇双发变叙叠叶号叹叽吁后吓吕吗唚吨听启吴呒呓呕呖呗员呙呛呜咏咔咙咛咝咤咴咸呱响哑哒哓哔哕哗哙哜哝哟唛唝唠唡唢唣唤呼啧啬啭啮啰啴啸喷喽喾嗫嗬嗳嘘嘤嘱噜噼嚣谑团园囱围囵国图圆圣圹场坂坏块坚坛坜坝坞坟坠垄垄垆垒垦垧垩垫垭垯垱垲垴埘埙埚垫坝塆塇尧报场"
)


def contains_zh(text: str) -> bool:
    """Reference prompt.py:35-39."""
    return bool(_ZH_RE.search(text))


def tw_to_simplified(text: str) -> str:
    """OpenCC tw2sp when available, else the char-level table."""
    try:
        from opencc import OpenCC  # optional dep

        return OpenCC("tw2sp.json").convert(text)
    except Exception:
        return text.translate(_T2S)


@functools.lru_cache()
def _native_marian_translator() -> Optional[Callable[[str], str]]:
    """The native Flax Marian (models/marian.py) when converted weights and
    tokenizer assets are provisioned: $MARIAN_PARAMS_PATH (orbax dir, see
    tools/fetch_and_convert.py) + source.spm/vocab.json."""
    import os

    params_path = os.environ.get("MARIAN_PARAMS_PATH", "data/marian/params")
    if not os.path.isdir(params_path):
        return None
    try:
        import jax.numpy as jnp

        from clip_diffusion_tpu.models.marian import (
            MarianConfig,
            MarianMT,
            _assets,
            greedy_decode,
            marian_detokenize,
            marian_tokenize,
        )
        from clip_diffusion_tpu.utils.checkpoint import load_params

        if _assets()[0] is None:  # weights without a real tokenizer: useless
            return None
        cfg = MarianConfig.opus_zh_en()
        model = MarianMT(cfg)
        params = load_params(params_path)

        def translate(text: str) -> str:
            ids = jnp.asarray(marian_tokenize([text], cfg=cfg))
            out = greedy_decode(model, params, ids)
            return marian_detokenize(out[0], cfg)

        return translate
    except Exception as e:  # pragma: no cover - asset problems
        warnings.warn(f"native Marian unavailable: {e}")
        return None


@functools.lru_cache()
def _marian_translator() -> Optional[Callable[[str], str]]:
    native = _native_marian_translator()
    if native is not None:
        return native
    try:
        from transformers import pipeline

        pipe = pipeline(
            "translation",
            model="Helsinki-NLP/opus-mt-zh-en",
            tokenizer="Helsinki-NLP/opus-mt-zh-en",
        )
        return lambda text: pipe(text)[0]["translation_text"]
    except Exception:
        return None


def translate_zh_to_en(
    text: str, translator: Optional[Callable[[str], str]] = None
) -> str:
    """zh -> en when the text contains Chinese (reference prompt.py:41-53).
    Identity (with a warning) when no translator is available."""
    if not contains_zh(text):
        return text
    text = tw_to_simplified(text)
    translator = translator or _marian_translator()
    if translator is None:
        warnings.warn(
            "MarianMT zh->en weights unavailable (zero-egress env); passing "
            "the prompt through untranslated. Provide a translator via "
            "Prompt(translator=...) or pre-fetch Helsinki-NLP/opus-mt-zh-en."
        )
        return text
    return translator(text)
