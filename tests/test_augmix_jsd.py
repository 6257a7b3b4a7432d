"""AugMix / aug-splits / JSD tests: loss math vs a torch re-derivation of
timm's JsdCrossEntropy, transform shapes, and the split-BN smoke train."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_jsd_matches_torch_formula():
    import torch
    import torch.nn.functional as F

    from lemevit_tpu.train.steps import jsd_cross_entropy

    rng = np.random.default_rng(0)
    s, b, k = 3, 4, 7
    logits = rng.normal(size=(s, b, k)).astype(np.float32)
    targets = np.eye(k, dtype=np.float32)[rng.integers(0, k, b)]
    smoothing = 0.1
    soft = targets * (1 - smoothing) + smoothing / k

    ours = float(jsd_cross_entropy(jnp.asarray(logits), jnp.asarray(soft),
                                   alpha=12.0))

    # timm JsdCrossEntropy: smoothed CE on split 0 + alpha * batchmean
    # KL(p_i || mixture), averaged over splits
    lt = torch.tensor(logits)
    ce = -(torch.tensor(soft)
           * F.log_softmax(lt[0], dim=-1)).sum(-1).mean()
    probs = [F.softmax(lt[i], dim=-1) for i in range(s)]
    logp_mix = torch.clamp(torch.stack(probs).mean(0), 1e-7, 1).log()
    jsd = sum(F.kl_div(logp_mix, p, reduction="batchmean")
              for p in probs) / s
    ref = float(ce + 12.0 * jsd)
    assert ours == pytest.approx(ref, rel=1e-5)


def test_augmix_transform_and_splits():
    from PIL import Image

    from lemevit_tpu.data.transforms import (AugMix, build_aug_policy,
                                             build_augsplit_transform)

    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (80, 96, 3), np.uint8))
    am = AugMix(magnitude=3, width=3)
    out = am(img)
    assert out.size == img.size and out.mode == "RGB"

    pol = build_aug_policy("augmix-m5-w2-d1")
    assert isinstance(pol, AugMix)
    assert pol.magnitude == 5 and pol.width == 2 and pol.depth == 1
    assert build_aug_policy(None) is None
    with pytest.raises(ValueError):
        build_aug_policy("autoaug-v0")

    tf = build_augsplit_transform(32, num_splits=3,
                                  auto_augment="augmix-m3-w3")
    views = tf(img)
    assert views.shape == (3, 32, 32, 3) and views.dtype == np.uint8


def test_split_bn_stats_stack_roundtrip():
    from lemevit_tpu.train.steps import (stack_batch_stats,
                                         unstack_batch_stats)
    stats = {"bn": {"mean": jnp.arange(4.0), "var": jnp.ones(4)}}
    stacked = stack_batch_stats(stats, 3)
    assert stacked["bn"]["mean"].shape == (3, 4)
    back = unstack_batch_stats(stacked)
    np.testing.assert_allclose(np.asarray(back["bn"]["mean"]),
                               np.arange(4.0))


def test_train_cli_aug_splits_jsd(tmp_path):
    from lemevit_tpu.cli.train import main
    out = main([
        "--synthetic", "--model", "lemevit_micro", "--img-size", "32",
        "--batch-size", "2", "--num-classes", "5", "--epochs", "1",
        "--steps-per-epoch", "2", "--warmup-epochs", "1",
        "--output", str(tmp_path), "--log-interval", "1", "--workers", "1",
        "--aug-splits", "3", "--jsd-loss",
    ])
    assert out["steps"] == 2
    assert (tmp_path / "lemevit_micro" / "summary.csv").exists()


def test_optimizer_factory_breadth():
    import optax
    from lemevit_tpu.train.optim import build_optimizer
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    grads = {"w": jnp.ones((4, 4)), "b": jnp.ones(4)}
    for opt in ("adamw", "adam", "sgd", "momentum", "nesterov",
                "rmsprop", "lamb", "adagrad"):
        tx = build_optimizer(0.1, opt=opt, params_example=params)
        st = tx.init(params)
        upd, _ = tx.update(grads, st, params)
        assert all(np.isfinite(np.asarray(u)).all()
                   for u in jax.tree.leaves(upd)), opt
    with pytest.raises(ValueError):
        build_optimizer(0.1, opt="nope", params_example=params)
    # sgd with weight decay must decay the 2D kernel but not the bias
    tx = build_optimizer(0.1, opt="sgd", weight_decay=0.5, momentum=0.0,
                         params_example=params)
    upd, _ = tx.update(jax.tree.map(jnp.zeros_like, grads),
                       tx.init(params), params)
    assert float(jnp.abs(upd["w"]).sum()) > 0    # decayed
    assert float(jnp.abs(upd["b"]).sum()) == 0   # masked out


def test_schedule_factory_breadth():
    from lemevit_tpu.train.optim import build_lr_schedule
    common = dict(base_lr=0.1, global_batch_size=512, steps_per_epoch=10,
                  epochs=10, warmup_epochs=1, warmup_lr=0.0, min_lr=1e-4)
    cos = build_lr_schedule(sched="cosine", **common)
    step = build_lr_schedule(sched="step", decay_epochs=3, decay_rate=0.1,
                             **common)
    multi = build_lr_schedule(sched="multistep", decay_milestones=(5,),
                              **common)
    poly = build_lr_schedule(sched="poly", power=1.0, **common)
    const = build_lr_schedule(sched="constant", **common)
    # warmup peaks at 0.1 for all
    for s in (cos, step, multi, poly, const):
        assert float(s(10)) == pytest.approx(0.1, rel=1e-2)
    # boundaries in epochs from training start: decay at epoch 3 (step 30)
    assert float(step(29)) == pytest.approx(0.1, rel=1e-6)
    assert float(step(35)) == pytest.approx(0.01, rel=1e-6)
    assert float(step(65)) == pytest.approx(0.001, rel=1e-6)
    assert float(multi(49)) == pytest.approx(0.1, rel=1e-6)
    assert float(multi(51)) == pytest.approx(0.01, rel=1e-6)  # milestone 5
    assert float(const(99)) == pytest.approx(0.1, rel=1e-6)
    assert float(poly(99)) < float(poly(50)) < 0.1            # decays
    with pytest.raises(ValueError):
        build_lr_schedule(sched="nope", **common)
