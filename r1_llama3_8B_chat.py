"""Interactive chat REPL (cf. /root/reference/r1_llama3_8B_chat.py):
streaming token output on the in-framework decoder."""

from __future__ import annotations

import os


def main():
    import jax.numpy as jnp

    from spider_tpu.models.decode import GenerateConfig, stream_generate
    from spider_tpu.models.serving_utils import load_or_init_llm

    model, params, tokenizer = load_or_init_llm(
        os.environ.get("SPIDER_TPU_LLM_CKPT"))
    history = ""
    print("spider-tpu chat (empty line to exit)")
    while True:
        try:
            user = input("you> ").strip()
        except EOFError:
            break
        if not user:
            break
        history += f"User: {user}\nAssistant:"
        ids = tokenizer(history, add_special_tokens=True).input_ids
        emb = model.apply(params, jnp.asarray([ids], jnp.int32),
                          method=model.embed)
        print("bot> ", end="", flush=True)
        reply_ids = []
        for tok in stream_generate(
                model, params, emb, jnp.asarray([len(ids)], jnp.int32),
                GenerateConfig(max_new_tokens=256,
                               eos_ids=(tokenizer.eos_token_id,),
                               pad_id=tokenizer.pad_token_id)):
            reply_ids.append(tok)
            print(tokenizer.decode([tok], skip_special_tokens=True),
                  end="", flush=True)
        print()
        history += tokenizer.decode(reply_ids, skip_special_tokens=True) + "\n"


if __name__ == "__main__":
    main()
