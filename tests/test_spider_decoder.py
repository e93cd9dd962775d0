import numpy as np
import pytest

from spider_tpu.common.config import Config
from spider_tpu.models import tags
from spider_tpu.models.spider_decoder import (
    SpiderDecoder, SpiderDecoderInfer, empty_predictions, empty_predictions_text)


def test_get_llm_text_res_and_modality():
    s = "<IMAGE>a</IMAGE><VIDEO>b</VIDEO><AUDIO>c</AUDIO>"
    assert tags.get_llm_text_res(s, "IMAGE") == ["a"]
    assert tags.get_llm_text_modality(s, ["IMAGE", "VIDEO", "AUDIO", "MASK", "BOX"]) == [
        "IMAGE", "VIDEO", "AUDIO"]
    multi = "Apple<MASK>Apple</MASK>, Banana<MASK>Banana</MASK>"
    assert tags.get_llm_text_res(multi, "MASK") == ["Apple", "Banana"]


def test_extract_story_elements_variants():
    text = ("<IMAGESTORY><GENERALPROMPT>'an alien visits Earth'</GENERALPROMPT>, "
            "<PROMPTARRAY>['lands in a park', 'meets a child']</PROMPTARRAY>, "
            "<STYLENAME>'Comic book'</STYLENAME></IMAGESTORY>")
    gp, pa, sn = tags.extract_story_elements(text)
    assert gp == "an alien visits Earth"
    assert pa == ["lands in a park", "meets a child"]
    assert sn == "Comic book"


def test_extract_story_elements_think_and_json():
    text = ('<GENERALPROMPT>x</GENERALPROMPT> stuff</think>'
            '<GENERALPROMPT>real</GENERALPROMPT>'
            '<PROMPTARRAY>["a", "b", "c"]</PROMPTARRAY>'
            '<STYLENAME>Photographic</STYLENAME>')
    gp, pa, sn = tags.extract_story_elements(text)
    assert gp == "real"
    assert pa == ["a", "b", "c"]
    assert sn == "Photographic"


def test_clean_prompt_array_fallbacks():
    assert tags.clean_prompt_array("") == []
    assert tags.clean_prompt_array("['a', 'b']") == ["a", "b"]
    assert tags.clean_prompt_array('["x", "y"]') == ["x", "y"]
    assert tags.clean_prompt_array("'a', 'b'") == ["a", "b"]
    assert tags.clean_prompt_array("one\ntwo") == ["one", "two"]
    assert tags.clean_prompt_array("<p>['a', 'b']</p>") == ["a", "b"]


def test_split_on_placeholders():
    text = "look at <IMAGE><IMAGE-Placeholder></IMAGE> and <AUDIO><AUDIO-Placeholder></AUDIO>!"
    pieces = tags.split_on_placeholders(text, ["IMAGE", "VIDEO", "AUDIO"])
    assert pieces == [("text", "look at "), ("modality", "IMAGE"),
                      ("text", " and "), ("modality", "AUDIO"), ("text", "!")]


def _fake_decoders():
    calls = {}

    def image_fn(prompts, **kw):
        calls.setdefault("IMAGE", []).append(prompts)
        return [np.zeros((8, 8, 3))]

    def video_fn(prompts, **kw):
        calls.setdefault("VIDEO", []).append(prompts)
        return np.zeros((4, 8, 8, 3))

    def audio_fn(prompts, **kw):
        calls.setdefault("AUDIO", []).append(prompts)
        return [np.zeros((100,))]

    def box_fn(image, caption):
        calls.setdefault("BOX", []).append(caption)
        return dict(bboxes=[[0, 0, 4, 4], [1, 1, 2, 2]],
                    label_names=[caption, caption],
                    scores=[0.9, 0.2])

    def mask_fn(image_sam, box, meta):
        calls.setdefault("MASK", []).append(tuple(np.asarray(box).tolist()))
        return np.ones((8, 8), dtype=bool)

    return calls, dict(IMAGE=image_fn, VIDEO=video_fn, AUDIO=audio_fn,
                       BOX=box_fn, MASK=mask_fn)


def test_spider_decoder_generate_dispatch():
    calls, decoders = _fake_decoders()
    dec = SpiderDecoder(decoders=decoders)
    samples = {"llm_text_all": ["<IMAGE>apple</IMAGE><VIDEO>dog</VIDEO><AUDIO>cat</AUDIO>"]}
    answers, predictions, predictions_text = dec.generate(
        samples, [], empty_predictions(), empty_predictions_text())
    assert answers == samples["llm_text_all"]
    assert predictions_text["IMAGE"] == ["apple"]
    assert predictions_text["VIDEO"] == ["dog"]
    assert predictions_text["AUDIO"] == ["cat"]
    assert len(predictions["IMAGE"]) == 1
    assert len(predictions["VIDEO"]) == 1
    assert len(predictions["AUDIO"]) == 1


def test_spider_decoder_decode_options_merge():
    """Config decode_options (negative_prompt/eta) reach the decoder fns."""
    seen = {}

    def image_fn(prompts, **kw):
        seen["IMAGE"] = kw
        return [np.zeros((8, 8, 3))]

    def audio_fn(prompts, **kw):
        seen["AUDIO"] = kw
        return [np.zeros((100,))]

    dec = SpiderDecoder(
        decoders=dict(IMAGE=image_fn, AUDIO=audio_fn),
        decode_options=dict(IMAGE=dict(negative_prompt=["blurry"], eta=0.3),
                            AUDIO=dict(eta=1.0)))
    dec.generate({"llm_text_all": ["<IMAGE>apple</IMAGE><AUDIO>cat</AUDIO>"]},
                 [], empty_predictions(), empty_predictions_text())
    assert seen["IMAGE"]["negative_prompt"] == ["blurry"]
    assert seen["IMAGE"]["eta"] == 0.3
    assert seen["IMAGE"]["num_inference_steps"] == 40  # default preserved
    assert seen["AUDIO"]["eta"] == 1.0


def test_spider_decoder_box_threshold_and_mask_rescale():
    calls, decoders = _fake_decoders()
    dec = SpiderDecoder(decoders=decoders)
    samples = {
        "llm_text_all": ["Dog<MASK>Dog</MASK>, Dog<BOX>Dog</BOX>"],
        "Image_ori_array": [np.zeros((16, 20, 3))],
        "IMAGE_SAM": [np.zeros((8, 8, 3))],
        "Meta_info": {"original_shape": [(16, 20)], "sam_shape": [(8, 10)]},
    }
    answers, predictions, predictions_text = dec.generate(
        samples, [], empty_predictions(), empty_predictions_text())
    # Box threshold 0.3 keeps only the 0.9-scored box.
    assert len(predictions["BOX"]["bboxes"][0]) == 1
    assert len(predictions["MASK"]) == 1
    # Mask path rescaled the top-1 box: [0,0,4,4] * [10/20, 8/16, ...] = [0,0,2,2]
    assert calls["MASK"][0] == (0.0, 0.0, 2.0, 2.0)


def test_spider_decoder_infer_story_path():
    story_calls = {}

    def story_fn(general_prompt, prompt_array, style_name):
        story_calls["args"] = (general_prompt, prompt_array, style_name)
        return [np.zeros((8, 8, 3))] * len(prompt_array)

    cfg = Config.fromdict(dict(model=dict(type="spider_decoder", name="spider_decoder")))
    infer = SpiderDecoderInfer(cfg, decoders={}, story_fn=story_fn)
    samples = {"llm_text_all": [
        "<IMAGESTORY><GENERALPROMPT>a cat</GENERALPROMPT>,"
        "<PROMPTARRAY>['sleeps', 'eats']</PROMPTARRAY>,"
        "<STYLENAME>Comic book</STYLENAME></IMAGESTORY>"]}
    answers, predictions, predictions_text = infer(samples)
    assert story_calls["args"] == ("a cat", ["sleeps", "eats"], "Comic book")
    assert len(predictions["IMAGESTORY"]) == 1
    assert predictions_text["IMAGESTORY_prompts"] == [["sleeps", "eats"]]


def test_spider_decoder_missing_decoders_graceful():
    dec = SpiderDecoder(decoders={})
    samples = {"llm_text_all": ["<IMAGE>apple</IMAGE>"]}
    answers, predictions, predictions_text = dec.generate(
        samples, [], empty_predictions(), empty_predictions_text())
    assert predictions["IMAGE"] == []
    assert predictions_text["IMAGE"] == ["apple"]
    assert answers == ["<IMAGE>apple</IMAGE>"]


def test_imagestory_nested_grammar_not_confused():
    s = ("intro <IMAGESTORY><GENERALPROMPT>'a cat'</GENERALPROMPT>, "
         "<PROMPTARRAY>['x']</PROMPTARRAY>, <STYLENAME>'Comic book'"
         "</STYLENAME></IMAGESTORY> outro <IMAGE>apple</IMAGE>")
    mods = tags.get_llm_text_modality(s)
    assert "IMAGESTORY" in mods and "IMAGE" in mods
    # IMAGE span is the plain one, not something inside the story block
    assert tags.get_llm_text_res(s, "IMAGE") == ["apple"]
    inner = tags.get_llm_text_res(s, "IMAGESTORY")[0]
    gp, pa, sn = tags.extract_story_elements(inner)
    assert (gp, pa, sn) == ("a cat", ["x"], "Comic book")


def test_multiline_and_unclosed_tags():
    s = "a<VIDEO>first\nsecond line</VIDEO> and <AUDIO>unclosed"
    assert tags.get_llm_text_res(s, "VIDEO") == ["first\nsecond line"]
    assert tags.get_llm_text_modality(s) == ["VIDEO"]  # unclosed AUDIO ignored
