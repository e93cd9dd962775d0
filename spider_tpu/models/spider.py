"""Spider — the trainable any-to-many multimodal model, TPU-native.

Re-design of /root/reference/spider/models/spider.py:76-1673: frozen
ImageBind encoder -> 1-token input projection -> (LoRA) Llama with extended
signal-token vocabulary -> per-modality alignment projectors whose outputs are
trained against the frozen task decoders' text-conditioning embeddings.

Architecture split (the TPU-first part): everything string-shaped happens on
the host ONCE per batch (`prepare_batch`: placeholder splicing, tokenization,
signal-span location — the reference does this per forward inside the hot
loop); everything numeric runs in ONE jitted loss (`compute_loss`) with
static-shape gathers at the precomputed signal positions, so the hot loop is
a single XLA program. Hidden-state taps use the stacked [L+1,B,T,H] output of
the scanned decoder instead of per-layer Python lists.
"""

from __future__ import annotations

import dataclasses
import logging
import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spider_tpu.common.registry import registry
from spider_tpu.models import tags
from spider_tpu.models.aligners import TextFcLayer, TextFcLayerMoE
from spider_tpu.models.decode import GenerateConfig, generate
from spider_tpu.models.llama import (LlamaConfig, LlamaForCausalLM,
                                     cross_entropy_loss)
from spider_tpu.models.tokenizer import (DEFAULT_MODALITY_TOKENS,
                                         DEFAULT_SPECIAL_TOKENS,
                                         extend_tokenizer)

IGNORE = -100


# ---------------------------------------------------------------------------
# losses (cf. spider.py:1154-1348)
# ---------------------------------------------------------------------------

def l2_loss(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Summed squared error per sample, then mean (reference's l2_loss)."""
    u = u.astype(jnp.float32)
    v = v.astype(jnp.float32)
    return jnp.mean(jnp.sum((u - v) ** 2, axis=tuple(range(1, u.ndim))))


def clip_align_loss(text_embeds: jnp.ndarray, image_embeds: jnp.ndarray,
                    logit_scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric InfoNCE over flattened token embeddings
    (spider.py:1162-1175)."""
    t = text_embeds.astype(jnp.float32).reshape(-1, text_embeds.shape[-1])
    i = image_embeds.astype(jnp.float32).reshape(-1, image_embeds.shape[-1])
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-8)
    i = i / (jnp.linalg.norm(i, axis=-1, keepdims=True) + 1e-8)
    logits = t @ i.T * jnp.exp(logit_scale)
    n = logits.shape[0]
    labels = jnp.arange(n)
    lt = -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                              labels[:, None], axis=-1).mean()
    li = -jnp.take_along_axis(jax.nn.log_softmax(logits.T, axis=-1),
                              labels[:, None], axis=-1).mean()
    return (lt + li) / 2.0


def sigmoid_bce_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    per_pixel = jnp.maximum(p, 0) - p * t + jnp.log1p(jnp.exp(-jnp.abs(p)))
    return per_pixel.reshape(per_pixel.shape[0], -1).mean(-1).sum()


def dice_loss(pred: jnp.ndarray, target: jnp.ndarray,
              scale: float = 1000.0, eps: float = 1e-6) -> jnp.ndarray:
    p = jax.nn.sigmoid(pred.astype(jnp.float32)).reshape(pred.shape[0], -1)
    t = target.astype(jnp.float32).reshape(target.shape[0], -1)
    num = 2 * (p / scale * t / scale).sum(-1)
    den = (p / scale) ** 2
    den = den.sum(-1) + ((t / scale) ** 2).sum(-1)
    return (1 - (num + eps) / (den + eps)).sum()


# ---------------------------------------------------------------------------
# Host-side batch preparation (cf. spider.py:725-940)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PreparedBatch:
    """Numeric view of one training batch — jit-ready."""
    input_ids: np.ndarray          # [B, L] (modality slots hold pad_id)
    slot_mask: Dict[str, np.ndarray]   # modality -> [B, L] one-hot rows
    slot_index: Dict[str, np.ndarray]  # modality -> [B, L] index into inputs
    targets: np.ndarray            # [B, L] with IGNORE outside answer
    # per-modality encoder inputs, stacked over occurrences (host order)
    modality_inputs: Dict[str, np.ndarray]
    # signal-token span positions per sample (for hidden-state taps):
    signal_pos: Optional[np.ndarray] = None   # [B, n_signal]
    text_span: Optional[np.ndarray] = None    # [B, 2] (start, end) caption span


def split_placeholder(text: str) -> List[str]:
    """'<IMAGE><IMAGE-Placeholder></IMAGE> a dog' ->
    ['<IMAGE>', '<IMAGE-Placeholder>', '</IMAGE> a dog']
    (spider.py:725-740)."""
    pattern = r"<[A-Z]+-Placeholder>"
    out, start = [], 0
    for m in re.finditer(pattern, text):
        out.append(text[start:m.start()])
        out.append(m.group())
        start = m.end()
    out.append(text[start:])
    return out


def get_modality(split: str) -> str:
    m = re.search(r"<([A-Z]+)-Placeholder>", split)
    assert m, split
    return m.group(1)


def get_llm_text_res_train(string: str, modality: str) -> List[str]:
    """Caption between <X> and [X0] (training answer grammar,
    spider.py:757-764)."""
    return re.findall(rf"<{modality}>(.*?)\[{modality}0\]", string)


@registry.register_model("spider")
class Spider:
    """Bundles the jitted compute path with host-side orchestration.

    Components (all optional except llm/tokenizer — absent ones disable the
    corresponding branches, like SpiderStory mode, spider.py:233-247):
      llm: (LlamaForCausalLM, params)
      tokenizer: extended tokenizer
      encoder: (ImageBindEncoder, params) or None
      aligners: {modality: (TextFcLayer, params)} or ('moe', TextFcLayerMoE, params)
      diffusion_pipes: {IMAGE/VIDEO/AUDIO: pipeline} (resident, jitted)
      sam: (SamModel, params) or None
      box_decoder: callable or None (Grounding DINO inference)
    """

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "Spider":
        """Config blob -> Spider, the registry-dispatch construction path
        (reference: registry.get_model_class("spider")(**cfg.model),
        base_task.py:38-40; ours goes through the checkpoint factory)."""
        from spider_tpu.models.factory import build_spider_from_config

        return build_spider_from_config(dict(model_config))

    def __init__(self, *, llm_model: LlamaForCausalLM, llm_params,
                 tokenizer,
                 name: str = "spider",
                 encoder_model=None, encoder_params=None,
                 llama_proj_params=None,
                 aligners: Optional[Dict[str, Tuple[Any, Any]]] = None,
                 moe_aligner: Optional[Tuple[Any, Any]] = None,
                 diffusion_pipes: Optional[Dict[str, Any]] = None,
                 sam=None, box_decoder=None,
                 modality_tokens: Optional[Dict[str, int]] = None,
                 max_context_len: int = 100,
                 use_embed_align_loss: bool = False,
                 only_embed_align_loss: bool = False,
                 word_align_loss: bool = False,
                 only_llm_gen_loss: bool = False,
                 alignment_layer: Sequence[int] = (-1,),
                 logit_scale: float = 1.0):
        self.model_name = name
        self.llm = llm_model
        self.llm_params = llm_params
        self.tokenizer = tokenizer
        self.encoder = encoder_model
        self.encoder_params = encoder_params
        self.llama_proj_params = llama_proj_params
        self.aligners = aligners or {}
        self.moe_aligner = moe_aligner
        self.diffusion_pipes = diffusion_pipes or {}
        self.sam = sam
        self.box_decoder = box_decoder
        self.modality_tokens = dict(modality_tokens or DEFAULT_MODALITY_TOKENS)
        self.max_context_len = max_context_len
        self.use_embed_align_loss = use_embed_align_loss
        self.only_embed_align_loss = only_embed_align_loss
        self.word_align_loss = word_align_loss
        self.only_llm_gen_loss = only_llm_gen_loss
        self.alignment_layer = tuple(alignment_layer)
        self.logit_scale = jnp.asarray(logit_scale, jnp.float32)

        self._tok_cache: Dict[str, List[int]] = {}
        self._signal_ids = {
            m: [self._one_id(f"[{m}{i}]") for i in range(n)]
            for m, n in self.modality_tokens.items()
        }
        self._end_id = self._one_id("[END]")
        self._loss_jit_cache: Dict[Any, Callable] = {}

    # ------------------------------------------------------------- tokenizer
    def _ids(self, text: str) -> List[int]:
        if text not in self._tok_cache:
            self._tok_cache[text] = list(
                self.tokenizer(text, add_special_tokens=False).input_ids)
        return list(self._tok_cache[text])

    def _one_id(self, token: str) -> int:
        ids = self._ids(token)
        assert len(ids) == 1, (token, ids)
        return ids[0]

    # ------------------------------------------------ trainable param bundle
    def trainable_params(self):
        tree = {"llm": self.llm_params, "logit_scale": self.logit_scale}
        if self.llama_proj_params is not None:
            tree["llama_proj"] = self.llama_proj_params
        if self.moe_aligner is not None:
            tree["moe_aligner"] = self.moe_aligner[1]
        else:
            tree["aligners"] = {m: p for m, (mod, p) in self.aligners.items()}
        if self.sam is not None:
            tree["sam"] = self.sam[1]
        return tree

    def update_params(self, tree):
        self.llm_params = tree["llm"]
        self.logit_scale = tree["logit_scale"]
        if "llama_proj" in tree:
            self.llama_proj_params = tree["llama_proj"]
        if "moe_aligner" in tree and self.moe_aligner is not None:
            self.moe_aligner = (self.moe_aligner[0], tree["moe_aligner"])
        if "aligners" in tree:
            self.aligners = {m: (self.aligners[m][0], p)
                             for m, p in tree["aligners"].items()}
        if "sam" in tree and self.sam is not None:
            self.sam = (self.sam[0], tree["sam"])

    # -------------------------------------------------------------- prepare
    def prepare_batch(self, samples: Dict[str, Any]) -> PreparedBatch:
        """Host: placeholder splicing + tokenization + signal-span location.

        Mirrors preparing_input_embedding (spider.py:847-940): sequence =
        [BOS] [INPUT] question(+modality slots) taskprompt (systemprompt)
        [OUTPUT] answer-with-signal-tokens [END], targets IGNORE outside the
        answer span.
        """
        tok = self.tokenizer
        pad_id = tok.pad_token_id
        bos_id = tok.bos_token_id
        B = len(samples["Question"])

        all_ids: List[List[int]] = []
        slot_entries: List[List[Tuple[int, str, int]]] = []  # (pos, modality, occurrence)
        target_spans: List[Tuple[int, List[int]]] = []
        signal_positions: List[List[int]] = []
        text_spans: List[Tuple[int, int]] = []
        modality_counts: Dict[str, int] = {}

        for idx in range(B):
            question = samples["Question"][idx]
            ids: List[int] = [bos_id] + self._ids("[INPUT]")
            slots: List[Tuple[int, str, int]] = []
            for split in split_placeholder(question):
                if "Placeholder" in split:
                    modality = get_modality(split)
                    occ = modality_counts.get(modality, 0)
                    modality_counts[modality] = occ + 1
                    slots.append((len(ids), modality, occ))
                    ids.append(pad_id)  # placeholder slot: 1 token
                elif split:
                    ids.extend(self._ids(split))
            ids.extend(self._ids(samples["TaskPrompt"][idx]))
            if "SystemPrompt" in samples:
                ids.extend(self._ids(samples["SystemPrompt"][idx]))
            # truncate question part (spider.py:882-888)
            keep = [s for s in slots if s[0] < self.max_context_len]
            ids = ids[: self.max_context_len]
            slots = keep

            # answer: replace placeholders with the signal-token run
            answer = samples["Answer"][idx]
            answer_parts = split_placeholder(answer)
            rebuilt = []
            for part in answer_parts:
                if "Placeholder" in part:
                    m = get_modality(part)
                    rebuilt.append("".join(
                        f"[{m}{i}]" for i in range(self.modality_tokens[m])))
                else:
                    rebuilt.append(part)
            answer_text = "[OUTPUT]" + "".join(rebuilt) + "[END]"
            answer_ids = self._ids(answer_text)[: self.max_context_len]

            q_len = len(ids)
            ids = ids + answer_ids
            target_spans.append((q_len, answer_ids))
            all_ids.append(ids)
            slot_entries.append(slots)

        L = max(len(i) for i in all_ids)
        input_ids = np.full((B, L), pad_id, np.int64)
        targets = np.full((B, L), IGNORE, np.int64)
        for i, ids in enumerate(all_ids):
            input_ids[i, : len(ids)] = ids
            q_len, answer_ids = target_spans[i]
            targets[i, q_len: q_len + len(answer_ids)] = answer_ids

        # signal-token + caption-text spans for the alignment taps
        # (cf. preparing_output_embeds, spider.py:1078-1147): within the
        # answer, <X> ... [X0..Xn] </X>; caption tokens are those between
        # <X> and [X0].
        task = samples["TaskPrompt"][0][1:-1] if samples.get("TaskPrompt") else ""
        if task in self.modality_tokens:
            n_sig = self.modality_tokens[task]
            begin_id = self._one_id(f"<{task}>")
            sig0 = self._signal_ids[task][0]
            pos = np.zeros((B, n_sig), np.int64)
            spans = np.zeros((B, 2), np.int64)
            for i in range(B):
                row = targets[i]
                begins = np.where(row == begin_id)[0]
                s0 = np.where(row == sig0)[0]
                if len(begins) and len(s0):
                    start = int(s0[0])
                    pos[i] = np.arange(start, start + n_sig)
                    spans[i] = (int(begins[0]) + 1, start)
            signal_pos, text_span = pos, spans
        else:
            signal_pos, text_span = None, None

        # gather per-modality encoder inputs in occurrence order
        modality_inputs: Dict[str, np.ndarray] = {}
        slot_mask = {m: np.zeros((B, L), bool) for m in modality_counts}
        slot_index = {m: np.zeros((B, L), np.int64) for m in modality_counts}
        for m, count in modality_counts.items():
            stacked = []
            for i in range(B):
                v = samples[m][i] if not isinstance(samples[m], np.ndarray) \
                    else samples[m][i]
                if isinstance(v, list):
                    stacked.extend(np.asarray(x) for x in v)
                else:
                    stacked.append(np.asarray(v))
            modality_inputs[m] = np.stack(stacked[:count], axis=0) \
                if stacked else np.zeros((0,))
        occ_counter: Dict[str, int] = {}
        for i, slots in enumerate(slot_entries):
            for pos_, m, occ in slots:
                slot_mask[m][i, pos_] = True
                slot_index[m][i, pos_] = occ

        return PreparedBatch(
            input_ids=input_ids, slot_mask=slot_mask, slot_index=slot_index,
            targets=targets, modality_inputs=modality_inputs,
            signal_pos=signal_pos, text_span=text_span)

    # --------------------------------------------------------------- embeds
    def _splice_embeds(self, llm_params, proj_params, batch: PreparedBatch,
                       modality_embeds: Dict[str, jnp.ndarray]):
        """input_ids -> embeddings with modality slots overwritten by the
        projected encoder outputs (1 token per occurrence)."""
        embeds = self.llm.apply(llm_params, jnp.asarray(batch.input_ids),
                                method=self.llm.embed)
        for m, enc in modality_embeds.items():
            if enc.shape[0] == 0:
                continue
            proj = enc @ proj_params["kernel"] + proj_params["bias"]
            mask = jnp.asarray(batch.slot_mask[m])[..., None]
            gathered = proj[jnp.asarray(batch.slot_index[m])]  # [B, L, H]
            embeds = jnp.where(mask, gathered.astype(embeds.dtype), embeds)
        return embeds

    def encode_modalities(self, batch: PreparedBatch) -> Dict[str, jnp.ndarray]:
        """Frozen ImageBind forward per present modality -> [N_occ, 1024]."""
        out: Dict[str, jnp.ndarray] = {}
        if self.encoder is None:
            return out
        for m, arr in batch.modality_inputs.items():
            if arr.size == 0:
                continue
            key = "audio" if m == "AUDIO" else "vision"
            emb = self.encoder.apply(self.encoder_params,
                                     {key: jnp.asarray(arr)})
            out[m] = jax.lax.stop_gradient(emb[key])
        return out

    # ----------------------------------------------------------------- loss
    def _apply_aligner(self, params_tree, modality: str, hidden: jnp.ndarray):
        if self.moe_aligner is not None:
            model = self.moe_aligner[0]
            return model.apply(params_tree["moe_aligner"], hidden,
                               modality=modality)
        model, _ = self.aligners[modality]
        return model.apply(params_tree["aligners"][modality], hidden,
                           modality=modality)

    def compute_loss(self, params_tree, batch: PreparedBatch,
                     modality_embeds: Dict[str, jnp.ndarray],
                     cond_embeds: Optional[jnp.ndarray],
                     task: str,
                     aux_arrays: Optional[Dict[str, jnp.ndarray]] = None
                     ) -> Dict[str, jnp.ndarray]:
        """Jit-friendly loss. cond_embeds: frozen text-conditioning target of
        the task decoder for this batch's captions (None for TEXT/BOX).
        aux_arrays for MASK training: IMAGE_SAM [B,3,s,s], MASK_GT [B,s,s]."""
        llm_params = params_tree["llm"]
        proj_params = params_tree.get("llama_proj")
        embeds = self._splice_embeds(llm_params, proj_params, batch,
                                     modality_embeds) \
            if proj_params is not None else \
            self.llm.apply(llm_params, jnp.asarray(batch.input_ids),
                           method=self.llm.embed)
        targets = jnp.asarray(batch.targets)
        logits, hidden_states, _ = self.llm.apply(
            llm_params, inputs_embeds=embeds, output_hidden_states=True)
        gen_loss, gen_acc = cross_entropy_loss(logits, targets)
        out = {"gen_loss": gen_loss, "gen_acc": gen_acc}

        no_decoder_loss = (self.only_llm_gen_loss
                           or task not in self.modality_tokens
                           or batch.signal_pos is None
                           or (cond_embeds is None and task != "MASK"))
        if no_decoder_loss:
            out["loss"] = gen_loss
            return out

        # hidden-state taps at signal positions (+ input embeds residual,
        # spider.py:357-360) for each alignment layer, summed.
        sig = jnp.asarray(batch.signal_pos)  # [B, n_sig]
        proj_sum = None
        for layer in self.alignment_layer:
            h = hidden_states[layer]                     # [B, T, H]
            tap = jnp.take_along_axis(h, sig[..., None], axis=1)
            inp = jnp.take_along_axis(embeds, sig[..., None], axis=1)
            fused = tap + inp
            proj = self._apply_aligner(params_tree, task, fused)
            proj_sum = proj if proj_sum is None else proj_sum + proj

        if task == "MASK":
            # SAM mask-decoder training: projected [MASK0] state prompts the
            # decoder as text_embeds; 2*BCE + 0.5*dice vs gt
            # (spider.py:606-638, 1291-1319).
            assert self.sam is not None and aux_arrays is not None
            sam_model, _ = self.sam
            sam_params = params_tree["sam"]
            # Only the mask decoder trains (base_model.py:221-233): freeze
            # encoder + prompt-encoder params (activations of the encoder
            # are already stop-gradded inside predict_text).
            sp = dict(sam_params["params"])
            for frozen in ("image_encoder", "prompt_encoder"):
                if frozen in sp:
                    sp[frozen] = jax.lax.stop_gradient(sp[frozen])
            sam_params = {**sam_params, "params": sp}
            masks = sam_model.apply(
                sam_params, jnp.asarray(aux_arrays["IMAGE_SAM"]),
                proj_sum.astype(jnp.float32), method=sam_model.predict_text)
            from spider_tpu.models.sam import postprocess_masks

            gt = jnp.asarray(aux_arrays["MASK_GT"])
            s = gt.shape[-1]
            pred = postprocess_masks(masks, (s, s), (s, s), img_size=s)[:, 0]
            bce = 2.0 * sigmoid_bce_loss(pred, gt) / max(gt.shape[0], 1)
            dice = 0.5 * dice_loss(pred, gt) / max(gt.shape[0], 1)
            out["bce_loss"] = bce
            out["dice_loss"] = dice
            out["loss"] = gen_loss + bce + dice
            return out

        target = cond_embeds
        if target.ndim == 2:  # AUDIO pooled -> (N, 1, D) (spider.py:1283)
            target = target[:, None, :]
        target = jax.lax.stop_gradient(target.astype(jnp.float32))
        mse = l2_loss(proj_sum, target)
        clip = clip_align_loss(proj_sum, target, params_tree["logit_scale"])
        semantic = mse + clip
        out[f"{task}_semantic_align_mse_loss"] = semantic
        out["loss"] = gen_loss + semantic
        return out

    # ---------------------------------------------------------- forward API
    def forward(self, samples: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """Training forward: samples dict -> loss dict
        (contract of spider.py:947-1070)."""
        task_prompt = samples.get("TaskPrompt", ["[TEXT]"])[0]
        task = task_prompt[1:-1]

        embed_align = 0.0
        if "Caption" in samples and self.use_embed_align_loss:
            embed_align = self.loss_text_encoder_align(samples["Caption"])
            if self.word_align_loss:
                # Local word-level alignment: sample half the caption's words
                # and align each through the same projector
                # (spider.py:963-980).
                import random as _random

                captions = samples["Caption"]
                words0 = re.findall(r"\b\w+\b", captions[0])
                select = max(1, len(words0) // 2)
                word_total = 0.0
                for _ in range(select):
                    picks = []
                    for cap in captions:
                        words = re.findall(r"\b\w+\b", cap) or [cap]
                        picks.append(_random.choice(words))
                    word_total = word_total + self.loss_text_encoder_align(picks)
                embed_align = (embed_align + word_total / float(select)) / 2.0
            if self.only_embed_align_loss:
                return {"loss": embed_align, "gen_loss": embed_align,
                        "gen_acc": 0.0}

        batch = self.prepare_batch(samples)
        modality_embeds = self.encode_modalities(batch)

        cond_embeds = None
        if task in ("IMAGE", "VIDEO", "AUDIO") and task in self.diffusion_pipes \
                and "Caption" in samples:
            pipe = self.diffusion_pipes[task]
            cond_embeds = pipe(prompt=samples["Caption"],
                               return_prompts_only=True)

        aux_arrays = None
        if task == "MASK" and self.sam is not None and "IMAGE_SAM" in samples:
            aux_arrays = {
                "IMAGE_SAM": np.stack([np.asarray(x)
                                       for x in samples["IMAGE_SAM"]]),
                "MASK_GT": np.stack([np.asarray(x)
                                     for x in samples["MASK"]]),
            }
        elif task == "MASK":
            task = "TEXT"  # no SAM: MASK degrades to gen_loss only

        out = self.compute_loss(self.trainable_params(), batch,
                                modality_embeds, cond_embeds, task,
                                aux_arrays)
        if isinstance(embed_align, jnp.ndarray) or embed_align:
            out["loss"] = out["loss"] + embed_align
            out[f"{task}_embed_align_mse_loss"] = embed_align
        return out

    def loss_text_encoder_align(self, captions: Sequence[str]) -> jnp.ndarray:
        """Align the LLM token-embedding space to the diffusion text encoder
        through the IMAGE aligner (spider.py:1177-1236)."""
        pipe = self.diffusion_pipes.get("IMAGE")
        if pipe is None:
            return jnp.asarray(0.0)
        ids = [self._ids(c) for c in captions]
        L = max(len(i) for i in ids)
        arr = np.full((len(ids), L), self.tokenizer.pad_token_id, np.int64)
        for i, r in enumerate(ids):
            arr[i, : len(r)] = r
        embeds = self.llm.apply(self.llm_params, jnp.asarray(arr),
                                method=self.llm.embed)
        proj = self._apply_aligner(
            {"moe_aligner": self.moe_aligner[1] if self.moe_aligner else None,
             "aligners": {m: p for m, (mod, p) in self.aligners.items()}},
            "IMAGE", embeds)
        cond = pipe(prompt=list(captions), return_prompts_only=True)
        cond = jax.lax.stop_gradient(jnp.asarray(cond, jnp.float32))
        return l2_loss(proj, cond) + clip_align_loss(proj, cond,
                                                     self.logit_scale)

    # -------------------------------------------------------------- generate
    def generate(self, samples: Dict[str, Any], answers: List[str],
                 predictions: Dict[str, Any], predictions_text: Dict[str, List],
                 max_new_tokens: Optional[int] = None,
                 guidance_scale: float = 7.5, num_inference_steps: int = 40,
                 rng=None):
        """Inference: decode text with per-step hidden-state retention, parse
        '<X>cap[X0..]</X>' spans, fuse projected hidden states 0.1/0.9 with
        the decoders' own text conditioning, dispatch
        (contract of spider.py:1465-1611)."""
        # The tag-parse + decoder dispatch below reads sample 0's answer and
        # hidden taps (the reference has the same single-sample shape); a
        # silent batch would return only sample 0's media.
        if len(samples["Question"]) != 1:
            raise ValueError(
                f"Spider.generate is single-sample (got batch "
                f"{len(samples['Question'])}); loop over samples or use "
                "serving/continuous.py for batched text decode")
        infer_samples = dict(samples)
        infer_samples["Answer"] = [""] * len(samples["Question"])
        batch = self.prepare_batch(infer_samples)
        # strip the empty answer ([OUTPUT][END]) from the prompt: decode
        # should begin at [OUTPUT].
        output_ids = self._ids("[OUTPUT]")
        end_len = len(self._ids("[END]"))
        trim = len(output_ids) + end_len
        prompt_ids = batch.input_ids[:, :-trim] if trim else batch.input_ids
        # re-append [OUTPUT] so generation starts the answer
        prompt_ids = np.concatenate(
            [prompt_ids, np.tile(np.asarray(output_ids)[None],
                                 (prompt_ids.shape[0], 1))], axis=1)
        # length-bucket the prompt so serving compiles O(buckets) programs,
        # not one per prompt length
        bucket = 32
        L = prompt_ids.shape[1]
        target = ((L + bucket - 1) // bucket) * bucket
        if target != L:
            # pad on the RIGHT; per-sample prompt_len below masks the pad
            prompt_ids = np.concatenate(
                [prompt_ids,
                 np.full((prompt_ids.shape[0], target - L),
                         self.tokenizer.pad_token_id, prompt_ids.dtype)],
                axis=1)
        batch_p = dataclasses.replace(
            batch, input_ids=prompt_ids,
            slot_mask={m: v[:, : prompt_ids.shape[1]]
                       for m, v in batch.slot_mask.items()},
            slot_index={m: v[:, : prompt_ids.shape[1]]
                        for m, v in batch.slot_index.items()})
        modality_embeds = self.encode_modalities(batch_p)
        embeds = self._splice_embeds(
            self.llm_params, self.llama_proj_params, batch_p, modality_embeds) \
            if self.llama_proj_params is not None else \
            self.llm.apply(self.llm_params, jnp.asarray(prompt_ids),
                           method=self.llm.embed)
        # true prompt length = 1 + last real position. Modality slots hold
        # pad_id but ARE real positions (their embeddings were spliced), so
        # count positions that are non-pad OR slots.
        real = prompt_ids != self.tokenizer.pad_token_id
        for m, mask in batch_p.slot_mask.items():
            real = real | mask
        Lp = real.shape[1]
        last = Lp - 1 - np.argmax(real[:, ::-1], axis=1)
        prompt_len = jnp.asarray(np.maximum(last + 1, 1), jnp.int32)
        gen_cfg = GenerateConfig(
            max_new_tokens=max_new_tokens or self.max_context_len,
            eos_ids=(self._end_id, self.tokenizer.eos_token_id),
            pad_id=self.tokenizer.pad_token_id,
            collect_layers=self.alignment_layer)
        gen_key = (embeds.shape, gen_cfg)
        if gen_key not in self._loss_jit_cache:
            self._loss_jit_cache[gen_key] = jax.jit(
                lambda p, e, l, r: generate(self.llm, p, e, l, gen_cfg,
                                            rng=r))
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        out = self._loss_jit_cache[gen_key](self.llm_params, embeds,
                                            prompt_len, rng)
        tokens = np.asarray(out["tokens"])          # [B, N]
        step_hidden = np.asarray(out["step_hidden"])  # [N-1, K, B, H]
        text = self.tokenizer.decode(
            [t for t in tokens[0] if t != self.tokenizer.pad_token_id],
            skip_special_tokens=False)
        output_texts = text.split("[END]")[0]
        answers.append(output_texts)

        for modality in tags.get_llm_text_modality(
                output_texts, list(self.modality_tokens)):
            caps = tags.get_llm_text_res(output_texts, modality)
            train_caps = get_llm_text_res_train(output_texts, modality)
            caps = train_caps or caps
            for mi, cap in enumerate(caps):
                predictions_text[modality].append(cap)
                pred = self._decode_modality_infer(
                    modality, mi, cap, tokens, step_hidden, samples,
                    guidance_scale, num_inference_steps)
                if pred is None:
                    continue
                if modality == "BOX":
                    predictions["BOX"]["bboxes"].append(pred["outputs_bboxes"][0])
                    predictions["BOX"]["label_names"].append(pred["outputs_label_names"][0])
                    predictions["BOX"]["scores"].append(pred["outputs_scores"][0])
                else:
                    predictions[modality].append(pred)
        return answers, predictions, predictions_text

    def _decode_modality_infer(self, modality: str, occurrence: int, cap: str,
                               tokens: np.ndarray, step_hidden: np.ndarray,
                               samples, guidance_scale, num_inference_steps):
        """Project the generated signal tokens' hidden states and drive the
        decoder, fusing 0.1*projected + 0.9*text conditioning
        (spider.py:417-460)."""
        pipe = self.diffusion_pipes.get(modality)
        if modality in ("IMAGE", "VIDEO", "AUDIO") and pipe is None:
            logging.info("no %s generation model.", modality)
            return None
        if modality == "BOX":
            if self.box_decoder is None or "Image_ori_array" not in samples:
                return None
            res = self.box_decoder(samples["Image_ori_array"][0], cap)
            return dict(outputs_bboxes=[res["bboxes"]],
                        outputs_label_names=[res["label_names"]],
                        outputs_scores=[res["scores"]])
        if modality == "MASK":
            if self.sam is None:
                return None
            return self._decode_mask_infer(occurrence, cap, tokens,
                                           step_hidden, samples)

        # locate the occurrence-th run of [X0..Xn] in the generated tokens
        sig_ids = self._signal_ids[modality]
        pos = np.where(tokens[0] == sig_ids[0])[0]
        if len(pos) <= occurrence:
            proj = None
        else:
            start = int(pos[occurrence])
            n = len(sig_ids)
            idx = np.arange(start, start + n)
            idx = idx[idx < step_hidden.shape[0]]
            if len(idx) == 0:
                proj = None
            else:
                taps = jnp.asarray(step_hidden[idx, :, 0])  # [n, K, H]
                fused = jnp.sum(taps, axis=1)[None]          # [1, n, H]
                params_tree = {"moe_aligner": self.moe_aligner[1]
                               if self.moe_aligner else None,
                               "aligners": {m: p for m, (mod, p)
                                            in self.aligners.items()}}
                proj = self._apply_aligner(params_tree, modality, fused)

        cond = pipe(prompt=[cap], return_prompts_only=True)
        if proj is not None:
            cond = jnp.asarray(cond)
            if cond.ndim == 2:
                proj = proj[:, 0]
            prompt_embeds = 0.1 * proj.astype(jnp.float32) + 0.9 * cond
        else:
            prompt_embeds = cond
        result = pipe(prompt_embeds=prompt_embeds,
                      guidance_scale=guidance_scale,
                      num_inference_steps=num_inference_steps)
        return result[0] if modality in ("IMAGE", "AUDIO") else result

    def _decode_mask_infer(self, occurrence, cap, tokens, step_hidden, samples):
        """DINO top-1 box + SAM with text-embed prompt (spider.py:576-638)."""
        if self.box_decoder is None or "IMAGE_SAM" not in samples:
            return None
        det = self.box_decoder(samples["Image_ori_array"][0], cap)
        if not det["bboxes"]:
            return None
        oh, ow = samples["Meta_info"]["original_shape"][0]
        sh, sw = samples["Meta_info"]["sam_shape"][0]
        box = np.asarray(det["bboxes"][0], np.float32) * np.array(
            [sw / ow, sh / oh, sw / ow, sh / oh], np.float32)
        sam_model, sam_params = self.sam
        image = jnp.asarray(samples["IMAGE_SAM"][0])[None]
        masks = sam_model.apply(sam_params, image, jnp.asarray(box)[None, None],
                                method=sam_model.predict_box)
        return np.asarray(masks[0])
