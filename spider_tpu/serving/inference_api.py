"""SpiderInference — trained-model serving wrapper
(cf. /root/reference/demo/inference_api.py:35-148: the DeepSpeed
init_inference + checkpoint load become resident jitted params; TP comes from
the partition rules rather than AutoTP module surgery).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

from spider_tpu.common.registry import registry
from spider_tpu.models import tags
from spider_tpu.models.spider_decoder import (empty_predictions,
                                              empty_predictions_text)


def load_demo_checkpoint(model, demo_config_path: str) -> bool:
    """demo_config.json analogue (reference:
    train_configs/demo_config.json — DS mp_rank_00_model_states.pt selection,
    demo/inference_api.py:152-176): {"type": "orbax", "checkpoints": [dir]}.
    Restores the first existing checkpoint's trained params into the model.
    Returns True if something was loaded."""
    import json
    import os

    with open(demo_config_path) as f:
        spec = json.load(f)
    for path in spec.get("checkpoints", []):
        if not os.path.exists(path):
            continue
        import orbax.checkpoint as ocp

        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        params = restored.get("params", restored)
        model.update_params(params)
        logging.info("SpiderInference: restored params from %s", path)
        return True
    logging.warning("demo_config %s: no checkpoint found on disk",
                    demo_config_path)
    return False


class SpiderInference:
    def __init__(self, cfg, model=None, story_fn=None,
                 demo_config: Optional[str] = None):
        if model is None:
            from spider_tpu.models.factory import build_spider_from_config

            model_config = dict(cfg.model)
            model_config.pop("type", None)
            model = build_spider_from_config(model_config)
        demo_config = demo_config or (cfg.run.get("demo_config")
                                      if hasattr(cfg, "run") else None)
        if demo_config:
            load_demo_checkpoint(model, demo_config)
        self.model = model
        self.story_fn = story_fn
        self.config = cfg

    def __call__(self, samples: Dict[str, Any], max_new_tokens: int = 64,
                 num_inference_steps: int = 40):
        answers = []
        predictions = empty_predictions()
        predictions_text = empty_predictions_text()
        answers, predictions, predictions_text = self.model.generate(
            samples, answers, predictions, predictions_text,
            max_new_tokens=max_new_tokens,
            num_inference_steps=num_inference_steps)
        # story path (inference_api.py:136-148)
        if answers:
            for story_text in tags.get_llm_text_res(answers[0], "IMAGESTORY"):
                predictions_text["IMAGESTORY"].append(story_text)
                gp, pa, sn = tags.extract_story_elements(story_text)
                if self.story_fn and gp and pa and sn:
                    preds = self.story_fn(general_prompt=gp, prompt_array=pa,
                                          style_name=sn)
                    predictions["IMAGESTORY"].append(preds)
                    predictions_text["IMAGESTORY_prompts"].append(pa)
        return answers, predictions, predictions_text
