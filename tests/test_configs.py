"""Config-of-record packs parse and pin the reference's recipes.

VERDICT r3 item 4: every downstream vertical must have reviewable config
files whose parsed values equal the reference's pinned hyperparameters:
  seg:  upernet_lemevit_512x512_80k_potsdam.py (AdamW 4e-4/0.05, poly
        warmup 1500 @ 1e-6, crop 512, stride 384, aux 0.4, nc 5 ignore 5)
  det:  faster_rcnn_orpn_lemevit_*_1x_dota10.py + schedule_{1x,2x,3x}
        (AdamW 1e-3/0.05, step [8,11]/[16,22]/[24,33], warmup 500/500/200
        @ 1e-3/1e-3/5e-3, clip 35, nms_pre 2000, samples_per_gpu 8)
  coco: lemevit_small_mask_rcnn_r50_fpn_1x_coco.py (AdamW 1e-4/0.05,
        step [8,11])
  cd:   change_detection/train.py:60-70 overrides (epochs 200, bs 16,
        lr 2.4e-4, bce->CE) + metadata.json patch 256
"""
import glob
import os

import pytest

from lemevit_tpu.utils.parser import parse_args_with_config

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _parse(cli_module, path):
    mod = __import__(f"lemevit_tpu.cli.{cli_module}",
                     fromlist=["build_parser"])
    args, text = parse_args_with_config(mod.build_parser(),
                                        ["--config", path])
    assert text  # args.yaml reproducibility dump is non-empty
    return args


@pytest.mark.fast
@pytest.mark.parametrize("variant", ["tiny", "small", "base"])
def test_seg_potsdam_config(variant):
    args = _parse("train_seg", os.path.join(
        ROOT, "configs", "seg",
        f"upernet_lemevit_{variant}_512x512_80k_potsdam.yaml"))
    assert args.backbone == f"lemevit_{variant}"
    assert args.lr == 4e-4 and args.weight_decay == 0.05
    assert args.iters == 80000 and args.crop_size == 512
    assert args.warmup_iters == 1500 and args.warmup_ratio == 1e-6
    assert args.min_lr == 0.0
    assert args.aux_weight == 0.4 and args.channels == 512
    assert args.eval_stride == 384
    assert args.num_classes == 5 and args.ignore_index == 5
    assert args.batch_size == 10


@pytest.mark.fast
@pytest.mark.parametrize("variant", ["tiny", "small", "base"])
def test_det_dota_1x_config(variant):
    args = _parse("train_det", os.path.join(
        ROOT, "configs", "det",
        f"oriented_rcnn_lemevit_{variant}_fpn_1x_dota10.yaml"))
    assert args.backbone == f"lemevit_{variant}"
    assert args.lr == 1e-3 and args.weight_decay == 0.05
    assert args.sched == "step" and args.decay_milestones == [8, 11]
    assert args.warmup_iters == 500 and args.warmup_ratio == 1e-3
    assert args.clip_grad == 35.0
    assert args.epochs == 12 and args.img_size == 1024
    assert args.rpn_nms_pre == 2000   # the reference contract
    assert args.num_classes == 15 and args.batch_size == 8


@pytest.mark.fast
@pytest.mark.parametrize("mult,ms,ep,wi,wr", [
    (2, [16, 22], 24, 500, 1e-3),
    (3, [24, 33], 36, 200, 5e-3),
])
def test_det_dota_longer_schedules(mult, ms, ep, wi, wr):
    args = _parse("train_det", os.path.join(
        ROOT, "configs", "det",
        f"oriented_rcnn_lemevit_small_fpn_{mult}x_dota10.yaml"))
    assert args.decay_milestones == ms and args.epochs == ep
    assert args.warmup_iters == wi and args.warmup_ratio == wr


@pytest.mark.fast
def test_coco_mask_rcnn_config():
    args = _parse("train_maskrcnn", os.path.join(
        ROOT, "configs", "coco",
        "mask_rcnn_lemevit_small_fpn_1x_coco.yaml"))
    assert args.backbone == "lemevit_small"
    assert args.lr == 1e-4 and args.weight_decay == 0.05
    assert args.sched == "step" and args.decay_milestones == [8, 11]
    assert args.epochs == 12 and args.num_classes == 80


@pytest.mark.fast
@pytest.mark.parametrize("variant", ["tiny", "small", "base"])
def test_cd_cdd_config(variant):
    args = _parse("train_cd", os.path.join(
        ROOT, "configs", "cd", f"bit_lemevit_{variant}_cdd.yaml"))
    assert args.backbone == f"lemevit_{variant}"
    assert args.lr == 2.4e-4 and args.batch_size == 16
    assert args.epochs == 200 and args.patch_size == 256
    assert args.loss == "ce"
    assert args.dec_depth == 8 and args.token_len == 4


@pytest.mark.fast
def test_all_config_files_parse():
    """Every YAML in configs/ is consumable by its CLI (no unknown keys)."""
    cli_by_dir = {"seg": "train_seg", "det": "train_det",
                  "cd": "train_cd", "coco": "train_maskrcnn",
                  "": "train"}
    n = 0
    for path in glob.glob(os.path.join(ROOT, "configs", "**", "*.yaml"),
                          recursive=True):
        rel = os.path.relpath(path, os.path.join(ROOT, "configs"))
        sub = os.path.dirname(rel)
        _parse(cli_by_dir[sub], path)
        n += 1
    assert n >= 15   # 3 cls + 3 seg + 5 det + 3 cd + 1 coco


@pytest.mark.fast
def test_mm_step_schedule_values():
    """mm_step_schedule reproduces mmcv's warmup + step decay numbers."""
    import numpy as np

    from lemevit_tpu.train.optim import mm_step_schedule
    s = mm_step_schedule(1e-3, steps_per_epoch=100, milestones=(8, 11),
                         gamma=0.1, warmup_iters=500, warmup_ratio=1e-3)
    assert np.isclose(float(s(0)), 1e-3 * 1e-3)
    assert np.isclose(float(s(250)), 1e-3 * (1 - 0.5 * (1 - 1e-3)))
    assert np.isclose(float(s(500)), 1e-3)
    assert np.isclose(float(s(799)), 1e-3)
    assert np.isclose(float(s(800)), 1e-4)    # epoch 8 boundary
    assert np.isclose(float(s(1100)), 1e-5)   # epoch 11 boundary


@pytest.mark.fast
def test_warmup_poly_schedule_values():
    import numpy as np

    from lemevit_tpu.train.optim import warmup_poly_schedule
    s = warmup_poly_schedule(4e-4, total_steps=80000, power=1.0,
                             min_lr=0.0, warmup_iters=1500,
                             warmup_ratio=1e-6)
    assert np.isclose(float(s(0)), 4e-4 * 1e-6)
    # mmcv PolyLrUpdaterHook: progress = s/total with the warmup factor
    # on top — at warmup end the poly decay has already begun
    assert np.isclose(float(s(1500)), 4e-4 * (1 - 1500 / 80000))
    assert np.isclose(float(s(40000)), 4e-4 * 0.5, rtol=1e-5)
    assert float(s(80000)) < 1e-8
