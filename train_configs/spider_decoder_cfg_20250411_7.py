"""SpiderFree decoder config, prompt-ablation variant 20250411_7
(reference: train_configs/spider_decoder_cfg_20250411_7.py). Structure =
our base decoder config; prompts from the verbatim variant corpus."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from decoder_prompt_variants import VARIANTS

model = dict(
    type="spider_decoder",
    name="spider_decoder",
    user_prompt="Please provide travel guide for Beijing",
    assistant_prompt="",
    get_prompt_embed_for_diffusion=False,
    max_context_len=4096,
    decode_options=dict(IMAGE=dict(), VIDEO=dict(), AUDIO=dict()),
    **VARIANTS["20250411_7"],
)
