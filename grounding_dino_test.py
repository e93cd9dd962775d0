"""Grounding DINO smoke script (cf. /root/reference/grounding_dino_test.py:
run the detector on one image with a text prompt and print the top boxes)."""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from spider_tpu.models.dino import (GroundingDINO, GroundingDINOInference,
                                        grounding_dino_test)
    from spider_tpu.models.tokenizer import TinyTokenizer

    cfg = grounding_dino_test()
    model = GroundingDINO(cfg)
    images = jnp.zeros((1, 3, 64, 64))
    ids = jnp.ones((1, cfg.max_text_len), jnp.int32)
    mask = jnp.ones((1, cfg.max_text_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), images, ids, mask)

    if len(sys.argv) > 1:
        from PIL import Image

        image = np.asarray(Image.open(sys.argv[1]).convert("RGB"))
    else:
        image = np.random.randint(0, 255, (96, 128, 3), np.uint8)
    prompt = sys.argv[2] if len(sys.argv) > 2 else "apple"

    infer = GroundingDINOInference(model, params, TinyTokenizer(),
                                   image_size=64, max_dets=5)
    res = infer(image, prompt)
    for box, name, score in zip(res["bboxes"], res["label_names"],
                                res["scores"]):
        print(f"{name}: {score:.3f} {np.round(box, 1).tolist()}")


if __name__ == "__main__":
    main()
