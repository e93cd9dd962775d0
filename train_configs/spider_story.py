# Story-training config (cf. /root/reference/train_configs/spider_story.py):
# LLM-only generation loss (the story task trains the LLM to emit the
# GENERALPROMPT/PROMPTARRAY/STYLENAME grammar; StoryDiffusion stays frozen),
# X->T captioning mixed with HDF5 story shards. Runnable at tiny scale out of
# the box; point build_info at real shards/h5 files to train at size.

pretrained_ckpt_path = None

model = dict(
    type="spider",
    name="spider_story",
    preset="tiny",
    lora_r=32,
    only_llm_gen_loss=True,       # story stage trains text generation only
    max_context_len=256,          # reference: 1000 (spider_story.py:57)
    system_prompt=(
        "You are Spider-Story, an AI assistant that generates structured "
        "story descriptions for visual storytelling. Respond with "
        "<GENERALPROMPT> 'a quoted subject' </GENERALPROMPT> <PROMPTARRAY> "
        "['scene one', 'scene two'] </PROMPTARRAY> <STYLENAME> 'Comic book' "
        "</STYLENAME> — the prompt array must be a valid Python list and the "
        "style must come from the supported style list."
    ),
)

datasets = dict(
    # X -> T captioning keeps the language head grounded
    i2t_cc_sbu=dict(
        batch_size=1,
        sample_ratio=20.0,
        build_info=dict(image_size=28, synthetic_size=32),
    ),
    v2t_webvid=dict(
        batch_size=1,
        sample_ratio=20.0,
        build_info=dict(image_size=28, synthetic_size=16),
    ),
    # HDF5 story shards (flintstones.h5 analogue; synthetic when no h5_path)
    flintstones=dict(
        batch_size=1,
        sample_ratio=20.0,
        build_info=dict(synthetic_size=16, image_size=28),
    ),
)

run = dict(
    task="image_text_pretrain",
    lr_sched="linear_warmup_cosine_lr",
    init_lr=1e-5,
    min_lr=8e-6,
    warmup_steps=5,
    weight_decay=0.05,
    max_epoch=1,
    iters_per_epoch=4,
    log_freq=2,
    seed=41,
    output_dir="output/spider_story",
    resume_ckpt_path=None,
    train_splits=["train"],
    job_name="spider_story",
    # mesh=dict(data=2, fsdp=2, model=2),  # multi-chip: shard the train step
)
