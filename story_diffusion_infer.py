"""Story generation entry (cf. /root/reference/story_diffusion_infer.py):
general prompt + prompt array + style -> consistent multi-image story."""

from __future__ import annotations

import sys

from spider_tpu.models.pipelines.sdxl_story import (build_tiny_sdxl,
                                                    init_story_generation,
                                                    story_generation)


def main():
    general_prompt = sys.argv[1] if len(sys.argv) > 1 else "a fox explorer"
    prompts = sys.argv[2].split("|") if len(sys.argv) > 2 else [
        "wakes up in a forest", "finds a map", "sails a river", "reaches home"]
    style = sys.argv[3] if len(sys.argv) > 3 else "Comic book"
    pipe = init_story_generation(build_tiny_sdxl())
    frames = story_generation(pipe, general_prompt=general_prompt,
                              prompt_array=prompts, style_name=style,
                              id_length=2, num_inference_steps=4)
    print(f"generated {len(frames)} frames of shape {frames[0].shape}")


if __name__ == "__main__":
    main()
