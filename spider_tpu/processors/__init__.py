"""Preprocessing pipelines (numpy host-side; cf. /root/reference/spider/processors/).

Importing registers the named processors the reference exposes through its
registry (blip_processors.py:28,71,113) with our TPU-native equivalents.
"""

from spider_tpu.common.registry import registry
from spider_tpu.processors.text import text_processor
from spider_tpu.processors.vision import clip_image_transform, train_augment


@registry.register_processor("blip_caption")
class CaptionProcessor:
    """Text cleanup (reference blip_processors.py:28 BlipCaptionProcessor)."""

    def __init__(self, prompt: str = "", max_words: int = 50):
        self.prompt = prompt
        self.max_words = max_words

    def __call__(self, caption: str) -> str:
        return self.prompt + text_processor(caption, max_words=self.max_words)


@registry.register_processor("blip2_image_train")
class ImageTrainProcessor:
    """Random-crop/flip train transform (blip_processors.py:71)."""

    def __init__(self, image_size: int = 224):
        self.image_size = image_size

    def __call__(self, img, rng=None):
        return clip_image_transform(train_augment(img, rng=rng),
                                    size=self.image_size)


@registry.register_processor("blip2_image_eval")
class ImageEvalProcessor:
    """Resize + CLIP-normalize eval transform (blip_processors.py:113)."""

    def __init__(self, image_size: int = 224):
        self.image_size = image_size

    def __call__(self, img):
        return clip_image_transform(img, size=self.image_size)
