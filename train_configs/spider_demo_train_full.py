# Full-data demo recipe (cf. /root/reference/train_configs/spider_demo_train_full.py):
# identical to spider_demo_train but pointed at the FULL shard corpora
# (cc_sbu 1256 shards, WebVid 2488 shards, AudioCaps train split) with
# max_context_len=100. Data roots are env-overridable; absent paths fall
# back to synthetic twins so the recipe stays instantiable anywhere.

import os

_root = os.environ.get("SPIDER_DATA_ROOT", "/data/spider")


def _maybe(path):
    """Real shard glob when the corpus is mounted, else synthetic twin."""
    full = os.path.join(_root, path)
    import glob

    return dict(webdataset_path=full) if glob.glob(full) else {}


model = dict(
    type="spider",
    preset="full",
    lora_r=32,
    max_context_len=100,
    paths=dict(),           # converter checkpoint paths (tools/verify_checkpoints.py)
)

datasets = dict(
    t2i_ts_cc_sbu=dict(
        batch_size=1, sample_ratio=2.0,
        build_info=dict(image_size=224, **_maybe("cc_sbu/*.tar")),
    ),
    t2v_ts_webvid=dict(
        batch_size=1, sample_ratio=2.0,
        build_info=dict(image_size=224, num_clips=5,
                        **_maybe("webvid/*.tar")),
    ),
    t2a_ts_audiocap=dict(
        batch_size=1, sample_ratio=2.0,
        build_info=dict(num_mels=128, target_length=204,
                        **_maybe("audiocaps/*.tar")),
    ),
    i2t_cc_sbu=dict(
        batch_size=1, sample_ratio=1.0,
        build_info=dict(image_size=224, **_maybe("cc_sbu/*.tar")),
    ),
    v2t_webvid=dict(
        batch_size=1, sample_ratio=1.0,
        build_info=dict(image_size=224, num_clips=5,
                        **_maybe("webvid/*.tar")),
    ),
    a2t_audiocap=dict(
        batch_size=1, sample_ratio=1.0,
        build_info=dict(num_mels=128, target_length=204,
                        **_maybe("audiocaps/*.tar")),
    ),
)

run = dict(
    task="image_text_pretrain",
    lr_sched="warmup_decay_lr",
    init_lr=2e-5,
    min_lr=0.0,
    warmup_steps=1000,
    max_epoch=1,
    iters_per_epoch=50000,
    log_freq=50,
    seed=42,
    output_dir="output/spider_demo_full",
    accum_grad_iters=1,
    max_grad_norm=1.0,
    ckpt_freq=1,
)
