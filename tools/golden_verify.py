"""On-mount golden output verification (VERDICT r3 item 8).

This repo's 23 weight converters are contract-tested (key manifests,
tools/verify_checkpoints.py) and numerics-tested at tiny scale against
transformers, but NO real checkpoint has ever passed through them
(zero-egress build environment). The day real weights mount, run THIS
script: it drives each flagship decoder end-to-end on real weights and
checks the output against recorded goldens — the step that catches a
silent convention mismatch which leaves every unit test green but
produces garbage at real scale.

Modes per check:
  * first verified run:  --record writes the golden to
    tests/fixtures/goldens/<name>.json (review the printed summary and
    the saved media by eye FIRST — a golden recorded from garbage just
    locks the garbage in);
  * thereafter: re-runs compare against the recorded golden.

Even without a golden recorded, every check enforces CRITERIA that do
not need one (the reference's observable behavior):
  dino:  top-1 'apple' box on apple.jpg has score >= 0.3 and covers
         5-95 % of the frame (cf. /root/reference/grounding_dino_test.py:
         1-40 — the reference's own smoke: detect the apple at 0.3
         threshold, spider_decoder.py:266).
  sam:   the mask prompted by that box lands inside the box: IoU(mask
         bbox, prompt box) >= 0.5 and mask area is 20-100 % of box area.
  sd15:  512px image at fixed seed/prompt is non-degenerate (per-channel
         std >= 0.05, not saturated) — catches the classic wrong-VAE /
         wrong-schedule failure that yields gray noise.
  omni_thinker: greedy text continuation of a fixed prompt is
         tokenizable ASCII text with no immediate repetition collapse.

Usage (paths point at the mounted real checkpoints):
  python tools/golden_verify.py --record \
      --apple /ckpts/apple.jpg \
      --dino  /ckpts/grounding_dino_swin_t.pth \
      --sam   /ckpts/sam_vit_h_4b8939.pth \
      --sd15  /ckpts/stable-diffusion-v1-5 \
      --omni  /ckpts/Qwen2.5-Omni-7B

Any requested check whose weights are missing FAILS LOUDLY (non-zero
exit); nothing is silently skipped.
"""

import argparse
import hashlib
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
GOLDEN_DIR = os.path.join(ROOT, "tests", "fixtures", "goldens")


def _golden_path(name):
    return os.path.join(GOLDEN_DIR, f"{name}.json")


def _load_golden(name):
    p = _golden_path(name)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def _save_golden(name, obj):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with open(_golden_path(name), "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    print(f"  recorded golden -> {_golden_path(name)}")


def _require(path, what):
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            f"{what} checkpoint not mounted at {path!r} — this check can "
            "only run with real weights (zero-egress build environment; "
            "see docs/golden_procedure.md)")


def _fail(msg):
    print(f"  FAIL: {msg}")
    return False


def _img_sha(arr_uint8):
    return hashlib.sha256(np.ascontiguousarray(arr_uint8).tobytes()
                          ).hexdigest()


def check_dino(dino_path, apple_path, record):
    """Reference smoke: Grounding DINO swin-T finds the apple at the 0.3
    threshold (grounding_dino_test.py, spider_decoder.py:266)."""
    from PIL import Image

    from spider_tpu.models.factory import from_pretrained

    _require(dino_path, "grounding_dino_swin_t")
    _require(apple_path, "apple.jpg test image")
    det = from_pretrained("grounding_dino", dino_path)
    image = np.asarray(Image.open(apple_path).convert("RGB"))
    out = det(image, "apple")
    boxes, scores = out["bboxes"], out["scores"]
    if not boxes:
        return _fail("no detections at all")
    x0, y0, x1, y1 = boxes[0]
    s = float(scores[0])
    frac = (x1 - x0) * (y1 - y0) / float(
        image.shape[0] * image.shape[1])
    print(f"  top-1 'apple': score={s:.3f} box={boxes[0]} "
          f"({100 * frac:.0f}% of frame)")
    ok = True
    if s < 0.3:
        ok = _fail(f"top score {s:.3f} < 0.3 (the reference's dispatch "
                   "threshold — real weights must clear it on apple.jpg)")
    if not 0.05 <= frac <= 0.95:
        ok = _fail(f"box covers {100 * frac:.0f}% of frame — implausible")
    golden = _load_golden("dino_apple")
    cur = {"box": [round(v, 1) for v in boxes[0]], "score": round(s, 3)}
    if golden is not None:
        gx = np.array(golden["box"]); cx = np.array(cur["box"])
        ix0, iy0 = np.maximum(gx[:2], cx[:2])
        ix1, iy1 = np.minimum(gx[2:], cx[2:])
        inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
        union = ((gx[2] - gx[0]) * (gx[3] - gx[1])
                 + (cx[2] - cx[0]) * (cx[3] - cx[1]) - inter)
        iou = inter / max(union, 1e-6)
        print(f"  IoU vs golden box: {iou:.3f}")
        if iou < 0.8:
            ok = _fail(f"box drifted from golden (IoU {iou:.3f} < 0.8)")
    elif record and ok:
        _save_golden("dino_apple", cur)
    return ok, (boxes[0] if ok else None), image


def check_sam(sam_path, box, image, record):
    """Box-prompted SAM mask (the reference chains DINO top-1 box into SAM,
    spider_decoder.py:168-229)."""
    import jax.numpy as jnp

    from spider_tpu.models.factory import from_pretrained
    from spider_tpu.processors.vision import sam_preprocess

    _require(sam_path, "sam_vit_h")
    model, params = from_pretrained("sam", sam_path)
    im1024, _hw = sam_preprocess(image)
    scale = 1024.0 / max(image.shape[:2])
    b = np.asarray(box, np.float32) * scale
    masks = model.apply(params, jnp.asarray(im1024)[None],
                        boxes=jnp.asarray(b)[None, None, :],
                        method=model.predict_box)
    mask = np.asarray(masks)[0, 0] > 0
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return _fail("empty mask")
    up = 1024 / mask.shape[-1]
    mx0, my0, mx1, my1 = xs.min() * up, ys.min() * up, \
        xs.max() * up, ys.max() * up
    ix0, iy0 = max(mx0, b[0]), max(my0, b[1])
    ix1, iy1 = min(mx1, b[2]), min(my1, b[3])
    inter = max(0, ix1 - ix0) * max(0, iy1 - iy0)
    union = ((mx1 - mx0) * (my1 - my0)
             + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    iou = inter / max(union, 1e-6)
    area_frac = mask.sum() * up * up / max(
        (b[2] - b[0]) * (b[3] - b[1]), 1e-6)
    print(f"  mask bbox IoU vs prompt box: {iou:.3f}; "
          f"mask/box area: {area_frac:.2f}")
    ok = True
    if iou < 0.5:
        ok = _fail(f"mask bbox IoU {iou:.3f} < 0.5 — mask not where the "
                   "prompt box is")
    if not 0.2 <= area_frac <= 1.1:
        ok = _fail(f"mask/box area ratio {area_frac:.2f} implausible")
    golden = _load_golden("sam_apple")
    cur = {"mask_area_px": int(mask.sum()), "iou_box": round(iou, 3)}
    if golden is not None:
        drift = abs(cur["mask_area_px"] - golden["mask_area_px"]) \
            / max(golden["mask_area_px"], 1)
        if drift > 0.05:
            ok = _fail(f"mask area drifted {100 * drift:.1f}% from golden")
    elif record and ok:
        _save_golden("sam_apple", cur)
    return ok


def check_sd15(sd15_path, record):
    """Fixed-seed SD-1.5 image (reference operating point: 512px, 40
    steps, CFG 7.5 — spider/models/spider.py:346)."""
    import jax

    from spider_tpu.models.factory import from_pretrained

    _require(sd15_path, "stable-diffusion-v1-5")
    pipe = from_pretrained("sd15", sd15_path)
    img = np.asarray(pipe(prompt=["a red apple on a wooden table"],
                          num_inference_steps=40, guidance_scale=7.5,
                          rng=jax.random.PRNGKey(1234)))
    arr = np.clip(np.asarray(img, np.float32), 0, 1)
    u8 = (arr * 255).astype(np.uint8)
    stds = arr.reshape(-1, arr.shape[-1]).std(axis=0)
    sat = float((arr < 0.02).mean() + (arr > 0.98).mean())
    sha = _img_sha(u8)
    out = os.path.join(GOLDEN_DIR, "sd15_apple.png")
    try:
        from PIL import Image

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        Image.fromarray(u8.squeeze()).save(out)
        print(f"  image saved for eyeballing -> {out}")
    except Exception:
        pass
    print(f"  sha256={sha[:16]}… channel stds={np.round(stds, 3).tolist()} "
          f"saturated={100 * sat:.0f}%")
    ok = True
    if float(stds.min()) < 0.05:
        ok = _fail("image is near-constant — classic wrong-VAE/scheduler "
                   "conversion failure")
    if sat > 0.9:
        ok = _fail("image is >90% saturated black/white")
    golden = _load_golden("sd15_apple")
    if golden is not None:
        if golden["sha256"] != sha:
            ok = _fail("image hash changed vs golden (same seed/prompt "
                       "must be bit-identical on the same hardware; on "
                       "DIFFERENT hardware re-record after eyeballing)")
    elif record and ok:
        _save_golden("sd15_apple", {"sha256": sha,
                                    "channel_stds": stds.tolist()})
    return ok


def check_omni(omni_path, record):
    """Greedy text continuation through the converted full-size thinker
    (reference flagship LLM load: qwen2.5omni_spider_web.py:368-383)."""
    from spider_tpu.models.qwen_omni import build_full_omni_thinker

    _require(omni_path, "Qwen2.5-Omni-7B")
    thinker = build_full_omni_thinker(omni_path, max_new_tokens=32)
    prompt = "The capital of France is"
    text = thinker.chat(prompt)
    print(f"  prompt={prompt!r} -> {text!r}")
    ok = True
    if not text.strip():
        ok = _fail("empty generation")
    words = text.split()
    if len(words) >= 6 and len(set(words)) <= 2:
        ok = _fail("generation collapsed to repetition — converted weights "
                   "are numerically wrong")
    golden = _load_golden("omni_capital")
    if golden is not None:
        if "paris" in golden["text"].lower() and "paris" not in text.lower():
            ok = _fail("golden answer contained 'Paris'; this run does not")
    elif record and ok:
        _save_golden("omni_capital", {"text": text})
    return ok


def check_omni_speech(omni_path, spk_path, record):
    """Full thinker -> talker -> token2wav chain on converted weights — the
    reference's one-call text+speech generate
    (qwen2.5omni_spider_web.py:468, streamed out at :591-600). Catches a
    conversion break anywhere in the 3-model chain that the per-model key
    manifests can't see (e.g. a talker conditioning-stream convention flip
    that still produces valid-looking codec tokens)."""
    from spider_tpu.models.omni_speech import build_full_omni_speech

    _require(omni_path, "Qwen2.5-Omni-7B")
    _require(spk_path, "spk_dict.pt speaker dictionary")
    pipe = build_full_omni_speech(omni_path, spk_path)
    speaker = sorted(pipe.speakers)[0] if pipe.speakers else None
    prompt = "Please greet the listener in one short sentence."
    import jax

    text, wav = pipe.chat_with_speech(prompt, speaker=speaker,
                                      rng=jax.random.PRNGKey(7))
    wav = np.asarray(wav, np.float32).reshape(-1)
    dur_s = wav.size / 24000.0          # BigVGAN output rate
    rms = float(np.sqrt(np.mean(wav ** 2))) if wav.size else 0.0
    peak = float(np.abs(wav).max()) if wav.size else 0.0
    print(f"  speaker={speaker!r} reply={text!r}")
    print(f"  wave: {wav.size} samples ({dur_s:.2f}s @24kHz) "
          f"rms={rms:.4f} peak={peak:.3f}")
    ok = True
    if not text.strip():
        ok = _fail("empty text reply")
    if not np.all(np.isfinite(wav)):
        ok = _fail("non-finite samples in waveform")
    if dur_s < 0.2:
        ok = _fail(f"waveform too short ({dur_s:.2f}s) — talker stopped "
                   "immediately or token2wav dropped the tokens")
    if rms < 1e-4:
        ok = _fail("waveform is silence — DiT/BigVGAN conversion failure")
    if rms > 0.9 or peak > 4.0:
        ok = _fail("waveform is full-scale noise — mel/codec convention "
                   "mismatch")
    out = os.path.join(GOLDEN_DIR, "omni_speech_greeting.wav")
    try:
        from spider_tpu.datasets.media import encode_wav_bytes

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(out, "wb") as f:
            f.write(encode_wav_bytes(np.clip(wav, -1, 1), 24000))
        print(f"  audio saved for listening -> {out}")
    except Exception as e:  # noqa: BLE001
        print(f"  (could not save wav: {e})")
    golden = _load_golden("omni_speech_greeting")
    cur = {"text": text, "n_samples": int(wav.size),
           "rms": round(rms, 4), "peak": round(peak, 4)}
    if golden is not None:
        if abs(cur["n_samples"] - golden["n_samples"]) \
                > 0.25 * max(golden["n_samples"], 1):
            ok = _fail("speech length drifted >25% from golden at fixed "
                       "seed/prompt")
        if golden["rms"] > 0 and not (0.5 <= rms / golden["rms"] <= 2.0):
            ok = _fail(f"rms {rms:.4f} vs golden {golden['rms']:.4f} — "
                       "loudness drifted >2x")
    elif record and ok:
        _save_golden("omni_speech_greeting", cur)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true",
                    help="record goldens on a verified first run")
    ap.add_argument("--apple", default=None, help="apple.jpg test image")
    ap.add_argument("--dino", default=None)
    ap.add_argument("--sam", default=None)
    ap.add_argument("--sd15", default=None)
    ap.add_argument("--omni", default=None)
    ap.add_argument("--spk", default=None,
                    help="spk_dict.pt (enables the omni_speech e2e check)")
    args = ap.parse_args()

    if not any((args.dino, args.sam, args.sd15, args.omni)):
        print(__doc__)
        sys.exit(2)

    failed = False
    box = image = None
    if args.dino:
        print("[dino] grounding-dino swin-T on apple.jpg")
        r = check_dino(args.dino, args.apple, args.record)
        ok, box, image = r if isinstance(r, tuple) else (r, None, None)
        failed |= not ok
    if args.sam:
        print("[sam] box-prompted SAM ViT-H mask")
        if box is None:
            print("  (no DINO box this run — using center half-frame box)")
            from PIL import Image

            _require(args.apple, "apple.jpg test image")
            image = np.asarray(Image.open(args.apple).convert("RGB"))
            h, w = image.shape[:2]
            box = [w * 0.25, h * 0.25, w * 0.75, h * 0.75]
        failed |= not check_sam(args.sam, box, image, args.record)
    if args.sd15:
        print("[sd15] fixed-seed 512px generation")
        failed |= not check_sd15(args.sd15, args.record)
    if args.omni:
        print("[omni_thinker] greedy continuation on converted weights")
        failed |= not check_omni(args.omni, args.record)
    if args.omni and args.spk:
        print("[omni_speech] thinker -> talker -> token2wav e2e")
        failed |= not check_omni_speech(args.omni, args.spk, args.record)
    print("RESULT:", "FAIL" if failed else "OK")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
