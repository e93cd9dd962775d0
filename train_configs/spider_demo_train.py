# Demo training config (cf. /root/reference/train_configs/spider_demo_train.py):
# tiny random-init Spider over synthetic shards — the CPU-runnable smoke
# config of the training stack. Same model/datasets/run trichotomy.

model = dict(
    type="spider",
    preset="tiny",
    lora_r=4,
    max_context_len=128,
)

datasets = dict(
    t2i_cc_sbu=dict(
        batch_size=1,
        sample_ratio=2.0,
        build_info=dict(image_size=28, synthetic_size=32),
    ),
    i2t_cc_sbu=dict(
        batch_size=1,
        sample_ratio=1.0,
        build_info=dict(image_size=28, synthetic_size=32),
    ),
    t2a_audiocap=dict(
        batch_size=1,
        sample_ratio=1.0,
        build_info=dict(num_mels=16, target_length=20),
    ),
)

run = dict(
    task="image_text_pretrain",
    lr_sched="warmup_decay_lr",
    init_lr=1e-4,
    min_lr=0.0,
    warmup_steps=5,
    max_epoch=1,
    iters_per_epoch=4,
    log_freq=2,
    seed=42,
    output_dir="output/spider_demo",
    accum_grad_iters=1,
    max_grad_norm=1.0,
)
